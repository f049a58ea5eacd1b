package graft.ml

import graft.functions.Exprs._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Principal component analysis over an embedding column, as pure DataFrame
  * dataflow — the dense-matrix sibling of [[Lsa]] (which factorizes the
  * sparse TF-IDF matrix): center on the exact per-position mean, accumulate
  * the d×d covariance, and power-iterate on the d²-row covariance table.
  *
  * Engine-portable by the standing ladder: means and covariance cells go
  * through 12-dp-rounded products into exact DECIMAL(30,12) sums (rounded
  * back to 12 dp), the iteration normalizes with a 10-dp sqrt, so every
  * round is bit-identical across engines and the oracles unroll the whole
  * chain as CTEs. The component's SIGN is not canonicalized — the all-ones
  * start makes the signed iterate itself deterministic (the q105 stance).
  *
  * Scale: n is unbounded, d is the embedding width (bounded — 64 here).
  * The one corpus-sized stage is the covariance accumulation: d² product
  * terms per row, generated ROW-LOCALLY (nested array transform + one
  * explode — no self-join) and collapsed by map-side partial aggregation,
  * so the exchange carries d²·partitions partials, never n·d² rows. The
  * iteration then runs entirely on d- and d²-row frames (broadcast-sized
  * by construction). At extreme d the standard mitigations are block-wise
  * covariance or subsampling; at d ≤ a few hundred this shape is exact
  * and cheap.
  */
object Pca {

  /** emb: (vec_id, embedding: array&lt;float|double&gt;). Returns the
    * d²-cell covariance table (i, j, c), 1-based positions, plus the
    * per-position means as (pos, mu) — both checkpointed. */
  private def covariance(emb: DataFrame): (DataFrame, DataFrame) = {
    // repartition BEFORE the d²-per-row expansion: the product generation
    // must parallelize by available cores, not by the input's file count —
    // a single-file local read would otherwise run the whole covariance on
    // one task (values are exact DECIMAL sums, so partitioning never
    // changes the result)
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .repartition(col("vec_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val mu = e.select(posexplode(col("v")).as(Seq("p0", "x")))
      .groupBy((col("p0") + 1).cast(LongType).as("pos"))
      .agg(round(davg(round(col("x"), 12), 12), 12).as("mu"))
      .localCheckpoint(eager = true)
    // array_sort(collect_list(struct)) — not collect_list-after-sort, whose
    // order aggregation does not guarantee (the KMeans pattern)
    val muArr = mu.agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("es"))
      .select(transform(col("es"), x => x.getField("mu")).as("mu_arr"))
    val n = e.agg(count(lit(1)).cast("double").as("n"))
    // centered products for ALL (i, j) pairs, generated inside one row —
    // no join touches anything n-sized, and the groupBy's map-side
    // partials bound the exchange at d² rows per partition
    val cells = e.crossJoin(broadcast(muArr))
      .select(zip_with(col("v"), col("mu_arr"), (x, m) => round(x - m, 12)).as("cv"))
      .select(explode(flatten(transform(col("cv"), (xi, i) =>
        transform(col("cv"), (xj, j) =>
          struct((i + 1).cast(LongType).as("i"), (j + 1).cast(LongType).as("j"),
            round(xi * xj, 12).as("p")))))).as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.p").as("p"))
      .groupBy(col("i"), col("j"))
      .agg(round(dsum(col("p"), 12), 12).as("s"))
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"), round(col("s") / col("n"), 12).as("c"))
      .localCheckpoint(eager = true)
    e.unpersist(blocking = false)
    (cells, mu)
  }

  /** Top principal direction: (pos, weight), unit norm, 8 dp. */
  def topComponent(emb: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"Pca.topComponent iterations must be >= 1, got $iterations")
    val (cells, _) = covariance(emb)
    iterate(cells, iterations)
      .select(col("pos"), round(col("v"), 8).as("weight"))
  }

  /** Per-vector score along the top component: (vec_id, score) with
    * score = (x − μ)·v, the centered projection, 8 dp. One d-row broadcast
    * against the corpus — scan-shaped. */
  def projectTop(emb: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"Pca.projectTop iterations must be >= 1, got $iterations")
    val (cells, mu) = covariance(emb)
    val comp = iterate(cells, iterations)
    val muArr = mu.agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("es"))
      .select(transform(col("es"), x => x.getField("mu")).as("mu_arr"))
    val vArr = comp.agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("es"))
      .select(transform(col("es"), x => x.getField("v")).as("v_arr"))
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("x"))
      .crossJoin(broadcast(muArr)).crossJoin(broadcast(vArr))
      .select(col("vec_id"),
        round(aggregate(
          zip_with(zip_with(col("x"), col("mu_arr"), (x, m) => round(x - m, 12)),
            col("v_arr"), (cx, w) => round(cx * w, 12)),
          lit(0.0d), (acc, t) => acc + t), 8).as("score"))
  }

  /** Power iteration v ← normalize(C v) on the d²-row covariance table:
    * all-ones start, per round one (j-keyed join + i-grouped sum) over the
    * checkpointed cell table and a 1-row norm broadcast — every frame here
    * is d- or d²-sized. Returns (pos, v) at full 12-dp precision. */
  private def iterate(cells: DataFrame, iterations: Int): DataFrame = {
    var v = cells.select(col("i").as("pos")).distinct()
      .withColumn("v", lit(1.0d)).localCheckpoint(eager = true)
    for (_ <- 1 to iterations) {
      val raw = cells.join(v.select(col("pos").as("j"), col("v")), "j")
        .groupBy(col("i"))
        .agg(round(dsum(round(col("c") * col("v"), 12), 12), 12).as("u"))
      val u = raw.localCheckpoint(eager = true)
      val nm = u.agg(round(sqrt(dsum(round(col("u") * col("u"), 12), 12)), 10).as("nm"))
      v = u.crossJoin(broadcast(nm))
        .select(col("i").as("pos"), round(col("u") / col("nm"), 12).as("v"))
        .localCheckpoint(eager = true)
    }
    v
  }
}
