package graft.operators

import graft.functions.Exprs._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Similarity search over embedding columns (Array[Float] → double math).
  *
  * `bruteTopK` is the exact baseline: broadcast the corpus, rank per query.
  * `lshTopK` is the scale path: random-hyperplane LSH buckets bound the
  * candidate set, then exact cosine re-ranks within buckets — the candidate
  * join is on the bucket key, so cost is Σ bucket² instead of n².
  * Hyperplanes are pseudo-random but fully deterministic (derived from
  * xxhash64 of (plane, dimension)), so results are reproducible.
  */
object Similarity {

  /** Cosine near-duplicate pairs within a block column (e.g. label):
    * (id_a, id_b, sim ≥ threshold). Exact within blocks. */
  def nearDupPairs(emb: DataFrame, threshold: Double, blockCol: String = "label"): DataFrame = {
    val e = emb.select(col("vec_id"), col(blockCol).as("block"),
      col("embedding").cast("array<double>").as("vec"))
    e.as("a").join(e.as("b"),
      col("a.block") === col("b.block") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", round(cosine(col("a.vec"), col("b.vec")), 6))
      .filter(col("sim") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("sim"))
  }

  /** Exact brute-force top-k: for each query row, the k most-cosine-similar
    * corpus rows (self excluded). Corpus side is broadcast. */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("q_vec"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").cast("array<double>").as("n_vec"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    q.crossJoin(broadcast(c))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("n_vec")), 6))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rk"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * uniform in [-1, 1) derived from xxhash64. */
  private def planeComponent(plane: Column, d: Column): Column =
    (pmod(xxhash64(plane * 1024 + d), lit(2000001L)).cast(DoubleType) - 1000000.0d) / 1000000.0d

  /** Bucket id per vector: `planes`-bit signature from hyperplane signs. */
  def lshBucket(vec: Column, planes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p => {
        val dotP = aggregate(
          zip_with(vec, transform(sequence(lit(0), size(vec) - 1), d => planeComponent(p, d)),
            (x, h) => x * h),
          lit(0.0d), (acc, x) => acc + x)
        // 2^p as exact double→long (shiftleft needs a literal shift amount)
        when(dotP >= 0.0d, pow(lit(2.0d), p).cast(LongType)).otherwise(0L)
      }),
      lit(0L), (acc, x) => acc + x)

  /** IVF (inverted-file) approximate top-k: a deterministic k-means coarse
    * quantizer buckets the corpus; each query probes its `nprobe` nearest
    * centroids and exact-ranks only those buckets' vectors. The other scale
    * path next to [[lshTopK]] — cost is Σ(query × probed-bucket sizes)
    * instead of n², with recall controlled by nprobe. */
  def ivfTopK(emb: DataFrame, k: Int, nlist: Int = 16, nprobe: Int = 4,
              kmeansIters: Int = 3): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val centroids = graft.ml.KMeans.fit(e, nlist, kmeansIters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = graft.ml.KMeans.assign(e, centroids)
    // each query probes its nprobe nearest centroid buckets
    val dist2 = aggregate(zip_with(col("vec"), col("centroid"), (x, c) => (x - c) * (x - c)),
      lit(0.0d), (acc, v) => acc + v)
    val pw = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("centroid_id").asc)
    val probes = e.crossJoin(broadcast(centroids))
      .withColumn("d2", dist2)
      .withColumn("rn", row_number().over(pw))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("centroid_id"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    probes
      .join(buckets.select(col("vec_id").as("n_id"), col("vec").as("n_vec"), col("centroid_id")),
        "centroid_id")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("n_vec")), 6))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rk"))
  }

  /** Approximate top-k via LSH buckets + exact re-rank inside each bucket.
    * Recall < 1 by design; union of several plane-sets (repetitions) raises it. */
  def lshTopK(emb: DataFrame, k: Int, planes: Int = 8, reps: Int = 4): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val repDf = e.sparkSession.range(reps).select(col("id").cast(LongType).as("rep"))
    val bucketed = e.crossJoin(broadcast(repDf))
      .withColumn("bucket", lshBucket(col("vec"), planes) + col("rep") * lit(1L << planes))
    val cand = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("a.vec").as("q_vec"),
        col("b.vec_id").as("n_id"), col("b.vec").as("n_vec"))
      .distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    cand.withColumn("sim", round(cosine(col("q_vec"), col("n_vec")), 6))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rk"))
  }
}
