package graft

import org.apache.spark.sql.DataFrame

/** Partition-width control for frames that are persisted or eagerly
  * localCheckpoint'ed and then re-read inside iterative loops.
  *
  * AQE's partition coalescing is DISABLED for cached plans
  * (`spark.sql.optimizer.canChangeCachedPlanOutputPartitioning` defaults
  * to false), so a frame that arrives through an exchange caches at the
  * full `spark.sql.shuffle.partitions` width — and every loop round then
  * schedules that many tasks over it. Invisible at the local default of
  * 32; at a cluster-shape 2048 the round-10 partition-count probe
  * measured the GD/PageRank/tokenizer-trainer loops 3-10× slower from
  * task scheduling alone (q96 26.4 s → 3.2 s from one [[compact]]).
  *
  * `coalesce` is narrow — no shuffle, map-side parallelism of the
  * producing stage is preserved; only the materialized partition count
  * (and with it the per-round task count) is capped.
  */
object Par {

  /** Cap at the session's core parallelism — for corpus- or vocab-sized
    * loop frames (edge tables, rank/label/distance tables, word frames):
    * full cluster width, never the shuffle-partition count. */
  def compact(df: DataFrame): DataFrame =
    df.coalesce(df.sparkSession.sparkContext.defaultParallelism)

  /** Collapse to one partition — for corpus-INDEPENDENT bounded frames
    * (weight vectors, centroid tables, merge tables, d-row iteration
    * state) where a single task is the right execution width. */
  def one(df: DataFrame): DataFrame = df.coalesce(1)

  /** Suffix forms: `frame.compacted.localCheckpoint(eager = true)`. */
  implicit class ParOps(private val df: DataFrame) extends AnyVal {
    def compacted: DataFrame = Par.compact(df)
    def onePart: DataFrame = Par.one(df)
  }
}
