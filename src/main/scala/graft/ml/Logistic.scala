package graft.ml

import graft.functions.Exprs._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.storage.StorageLevel

/** Distributed binary logistic regression by full-batch gradient descent, as
  * pure DataFrame dataflow — the trainable quality/domain classifier a
  * curation pipeline gates documents with (the fastText-classifier role in
  * CCNet/RefinedWeb-style pipelines, expressed over engineered per-doc
  * features instead of an external embedding model).
  *
  * Engine-portable determinism, same toolkit as [[KMeans]] / the q90
  * char-LM: the margin is rounded to 12 dp before `exp` (so both engines
  * exponentiate identical doubles), the sigmoid to 10 dp (the `ln`-rounding
  * precedent — JVM/libm differ in the last ulp), each per-feature gradient
  * term to 12 dp before the exact DECIMAL(30,12) accumulator (partial-
  * aggregation-order independent), and each weight update to 12 dp — every
  * round is bit-identical across engines and partitionings, which is what
  * lets q96/q97 unroll the whole optimization as DuckDB CTEs.
  *
  * Scale: per round, one (d+1)-row broadcast (the weight vector — feature-
  * count-bounded, never corpus-sized) and one n×d posexplode shuffle into d
  * keys with map-side combine — the [[KMeans]] update shape. The single
  * driver action is one `count` before the loop (the gradient's 1/n). Full-
  * batch GD is the deterministic choice: SGD's per-row update order is
  * exactly what a distributed engine cannot (and should not) pin down.
  */
object Logistic {

  /** data: (id, x: array<double> — bias feature included by the caller,
    * y: double 0/1). Returns (pos, weight), pos 0-based over x.
    *
    * Contract: `data` is non-empty and every `x` has the same length (the
    * dimension is read from one row; [[graft.functions.DotProduct]]
    * min-truncates a ragged vector rather than erroring, so a violation
    * surfaces as a silently misfit model, not an exception). */
  def train(data: DataFrame, lr: Double, iterations: Int): DataFrame = {
    require(iterations >= 0, s"Logistic.train iterations must be >= 0, got $iterations")
    require(!lr.isNaN && !lr.isInfinite, s"Logistic.train lr must be finite, got $lr")
    // coalesce to cluster width before persist: AQE partition coalescing
    // is DISABLED for cached plans (canChangeCachedPlanOutputPartitioning
    // defaults false), so a feature frame arriving through a
    // spark.sql.shuffle.partitions-wide exchange would otherwise cache at
    // that width — and every GD round then launches that many map tasks
    // over it. At 2048 partitions the 16-round loop spent ~8× the 32-
    // partition wall clock on task scheduling alone (round-10 probe).
    // coalesce (narrow, no shuffle) caps the cached frame at the
    // cluster's core count without losing scan parallelism.
    val e = data.select(col("id"), col("x"), col("y"))
      .coalesce(data.sparkSession.sparkContext.defaultParallelism)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = e.count().toDouble
    // d+1 zero weights, dimension read from the data (no driver-side schema
    // peek): one row's positions, zeroed. Eagerly checkpointed — it is the
    // loop seed and must not re-derive from e after e is unpersisted.
    // The weight frame is (d+1)-row — corpus-independent — so it must NOT
    // inherit spark.sql.shuffle.partitions: at cluster-scale partition
    // counts (2048) each round's weight shuffle + localCheckpoint schedules
    // thousands of near-empty tasks, and the 16-round loop multiplies that
    // into the dominant cost (the round-10 partition-count probe measured
    // q97 6.8× slower at 2048 than at 32 from exactly this). coalesce(1)
    // pins the bounded frames to one task; the corpus-sized gradient
    // shuffle keeps its map-side parallelism (the reduce side reads
    // mappers × (d+1) map-combined partials).
    var weights = e.limit(1)
      .select(posexplode(col("x")))
      .select(col("pos"), lit(0.0d).as("w"))
      .coalesce(1)
      .localCheckpoint(eager = true)
    for (_ <- 1 to iterations) {
      // d-row frame → 1-row array, sorted by pos (the KMeans assembly idiom)
      val wArr = weights
        .agg(array_sort(collect_list(struct(col("pos"), col("w")))).as("es"))
        .select(transform(col("es"), x => x.getField("w")).as("wv"))
      val scored = e.crossJoin(broadcast(wArr))
        .withColumn("p",
          round(lit(1.0d) / (lit(1.0d) + exp(-round(dot(col("x"), col("wv")), 12))), 10))
      weights = weights.join(
        scored.select(col("p"), col("y"), posexplode(col("x")).as(Seq("pos", "xj")))
          .groupBy(col("pos"))
          .agg((dsum(round((col("p") - col("y")) * col("xj"), 12), 12) / lit(n)).as("g")),
        "pos")
        .select(col("pos"), round(col("w") - lit(lr) * col("g"), 12).as("w"))
        .coalesce(1)
        .localCheckpoint(eager = true)
    }
    e.unpersist(blocking = false)
    weights.select(col("pos").cast(LongType).as("pos"), col("w").as("weight"))
  }

  /** Sigmoid scores for `data` (id, x) under trained `weights` (pos, weight):
    * (id, score), score rounded to 10 dp — the same arithmetic as training,
    * so an external engine replays it. Weight frame is broadcast-sized. */
  def score(data: DataFrame, weights: DataFrame): DataFrame = {
    val wArr = weights
      .agg(array_sort(collect_list(struct(col("pos"), col("weight")))).as("es"))
      .select(transform(col("es"), x => x.getField("weight")).as("wv"))
    data.select(col("id"), col("x")).crossJoin(broadcast(wArr))
      .select(col("id"),
        round(lit(1.0d) / (lit(1.0d) + exp(-round(dot(col("x"), col("wv")), 12))), 10)
          .as("score"))
  }
}
