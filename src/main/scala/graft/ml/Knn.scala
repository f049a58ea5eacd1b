package graft.ml

import graft.functions.Exprs._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** kNN classifier (SURVEY.md §2.3 J3 + §2.5 T2 + §2.4 A8): broadcast
  * cross-join similarity kernel → per-query top-k → majority vote.
  *
  * The reference loads the whole train matrix into every task's heap
  * (KNNMapper.java:52-74) and hand-maintains a k-best array (:147-159).
  * Here the train side is an explicit `broadcast` (Spark plans a
  * BroadcastNestedLoopJoin — the same replicated-join shape, but spillable
  * and columnar), and top-k is a rank window partitioned by query.
  *
  * Scale path: for train sets beyond broadcast size, swap the kernel for the
  * LSH-bucketed candidate join in [[graft.operators.Similarity]] — same
  * downstream top-k/vote plan.
  *
  * Similarities are rounded to 6 dp *before* ranking so that rank order (and
  * therefore the result set) is identical across engines and run-to-run; ties
  * break on neighbor id.
  */
object Knn {

  /** Top-k neighbors of each test row among train rows by cosine similarity
    * over double-array `vec` columns. Output: (q_id, n_id, n_label, sim, rk). */
  def neighbors(test: DataFrame, train: DataFrame, k: Int): DataFrame = {
    // norms per ROW on both join inputs (one dot per pair instead of three;
    // sims bit-identical — Exprs.cosinePre)
    val t = test.select(col("id").as("q_id"), col("vec").as("q_vec"))
      .withColumn("q_nrm", vnorm(col("q_vec")))
    val tr = train.select(col("id").as("n_id"), col("label").as("n_label"), col("vec").as("n_vec"))
      .withColumn("n_nrm", vnorm(col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    t.crossJoin(broadcast(tr))
      .withColumn("sim", round(cosinePre(dot(col("q_vec"), col("n_vec")),
        col("q_nrm"), col("n_nrm")), 6))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("n_label"), col("sim"), col("rk"))
  }

  /** Top-k neighbors over sparse MapType(idx → weight) feature columns — the
    * reference's own vector representation (KNNMapper.java:20). Same plan
    * shape as [[neighbors]], kernel swapped for [[mapCosine]]. */
  def neighborsSparse(test: DataFrame, train: DataFrame, k: Int): DataFrame = {
    val t = test.select(col("id").as("q_id"), col("features").as("q_f"))
    val tr = train.select(col("id").as("n_id"), col("label").as("n_label"), col("features").as("n_f"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    t.crossJoin(broadcast(tr))
      .withColumn("sim", round(mapCosine(col("q_f"), col("n_f")), 6))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("n_label"), col("sim"), col("rk"))
  }

  private def vote(nbrs: DataFrame): DataFrame = {
    val votes = nbrs.groupBy(col("q_id"), col("n_label")).agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("votes").desc, col("n_label").asc)
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id"), col("n_label").as("pred"))
  }

  /** Majority vote over the k neighbors (A8): most votes, then highest total
    * similarity is *not* used (the reference votes by count only,
    * KNNMapper.java:161-184) — ties break on smallest label. */
  def classify(test: DataFrame, train: DataFrame, k: Int): DataFrame =
    vote(neighbors(test, train, k))

  /** [[classify]] over sparse MapType feature vectors. */
  def classifySparse(test: DataFrame, train: DataFrame, k: Int): DataFrame =
    vote(neighborsSparse(test, train, k))

  /** The kNN plan for train sets beyond broadcast size — the scale path the
    * Scaladoc above names, wired end-to-end: sign-LSH buckets generate the
    * candidate pairs (both sides hashed with the same deterministic
    * (rep, plane, dim) hyperplanes from [[graft.operators.Similarity]]), the
    * bounded-heap [[TopK]] aggregator ranks them so at most k rows per query
    * survive partial aggregation, and the same A8 majority [[vote]] picks the
    * label. Every join is equi-key (bucket, then id): nothing is broadcast or
    * replicated, so the plan holds when train is 100 TB.
    *
    * Approximate by design: a true neighbor sharing no bucket in any of the
    * `reps` repetitions is missed. To keep recall high without extra passes
    * over the (large) train side, the QUERY side multi-probes: each query
    * also checks the `planes` buckets at Hamming distance 1 from its own
    * signature (Lv et al., "Multi-Probe LSH", VLDB'07). A neighbor whose
    * signature differs in ≤1 bit still collides, which raises per-rep
    * collision probability roughly (1 + planes·(1-p)/p)× at the cost of
    * (planes+1)× more QUERY bucket rows — the train side, the side that is
    * 100 TB, is hashed exactly once per rep. q67 oracle-checks prediction
    * agreement against the exact broadcast path as an invariant (q50's
    * pattern). Contract: fixed-dimension `vec` columns (dim is peeked from
    * one train row, same as [[graft.operators.Similarity.lshTopK]]). */
  def classifyLsh(test: DataFrame, train: DataFrame, k: Int,
                  planes: Int = 5, reps: Int = 10): DataFrame = {
    import graft.operators.Similarity
    val spark = test.sparkSession
    import spark.implicits._
    // both frames feed a bucket branch and a re-rank join → pin; the caller
    // releases via graft.Caching.release() once the result is consumed
    // norms ride the pins: computed once per vector at materialization, so
    // the re-rank join pays one dot per candidate pair instead of three
    // (sims bit-identical — Exprs.cosinePre)
    val t = graft.Caching.pin(
      test.select(col("id").as("q_id"), col("vec").as("q_vec"))
        .withColumn("q_nrm", vnorm(col("q_vec"))))
    val tr = graft.Caching.pin(
      train.select(col("id").as("n_id"), col("label").as("n_label"), col("vec").as("n_vec"))
        .withColumn("n_nrm", vnorm(col("n_vec"))))
    val first = tr.select(size(col("n_vec")).as("d")).head(1)
    require(first.nonEmpty, "classifyLsh: empty train set")
    val dim = first.head.getInt(0)
    // flip masks for multi-probing: 0 (the exact bucket) plus each single bit
    val probeMasks = array((lit(0L) +: (0 until planes).map(p => lit(1L << p))): _*)
    def buckets(df: DataFrame, idCol: String, vecCol: String, probe: Boolean): DataFrame = {
      val q = df.select(col(idCol), Similarity.quantize(col(vecCol)).as("qv"))
      (0 until reps).map { r =>
        val base = q.select(col(idCol), Similarity.lshBucket(col("qv"), planes, r, dim).as("b0"))
        val b =
          if (!probe) base.select(col(idCol), col("b0").as("b"))
          else base.select(col(idCol), col("b0"), explode(probeMasks).as("m"))
            .select(col(idCol), col("b0").bitwiseXOR(col("m")).as("b"))
        b.select(col(idCol), (col("b") + lit(r.toLong << planes)).as("bucket"))
      }.reduce(_ unionByName _)
    }
    val cand = buckets(t, "q_id", "q_vec", probe = true)
      .join(buckets(tr, "n_id", "n_vec", probe = false), "bucket")
      // ids only through the distinct shuffle — vectors re-attach below
      .select(col("q_id"), col("n_id")).distinct()
    val scored = cand
      .join(t, "q_id")
      .join(tr.select(col("n_id"), col("n_vec"), col("n_nrm")), "n_id")
      .select(col("q_id"), col("n_id"), round(cosinePre(dot(col("q_vec"), col("n_vec")),
        col("q_nrm"), col("n_nrm")), 6).as("sim"))
    val top = scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => TopK.Scored(r._2, r._3))
      .agg(TopK.topK(k).toColumn.name("top"))
      .toDF("q_id", "top")
      .select(col("q_id"), explode(col("top")).as("s"))
      .select(col("q_id"), col("s.id").as("n_id"))
    vote(top.join(tr.select(col("n_id"), col("n_label")), "n_id"))
  }
}
