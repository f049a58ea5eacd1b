package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (the attribution shape: every click matched to the
  * impression that preceded it within an attribution window).
  *
  * Unlike the stream-static joins elsewhere in this package
  * ([[StreamingDedup.minhashVerifiedPairs]] probes a pinned batch frame),
  * BOTH sides here are unbounded — so the join is only executable with
  * bounded state, which Spark grants when (a) both sides carry a watermark
  * and (b) the join condition bounds the event-time distance between
  * matching rows. Each side then buffers only rows younger than
  * watermark + maxDelay; older state is evicted per micro-batch. That state
  * bound is the whole design: at 100 TB/day neither side could ever be
  * collected, and the buffered window is seconds-to-minutes of data
  * partitioned by the join key.
  *
  * Semantics are EXACTLY the batch interval join over the same frames
  * (asserted by StreamingJoinSpec): inner matches are
  * `same key ∧ imp_ts ≤ clk_ts ≤ imp_ts + maxDelay`; the left-outer
  * variant additionally emits (impression, null) once the watermark passes
  * the impression's attribution deadline — the streaming-native way to say
  * "this impression definitively never converted".
  */
object StreamingJoins {

  /** Attribution join. impressions: (ts, key, …imp cols), clicks: (ts, key,
    * …clk cols). Returns (key, imp_ts, clk_ts) pairs matched within
    * [imp_ts, imp_ts + maxDelay]; `joinType` "inner" or "leftOuter" (outer
    * rows carry null clk_ts once the deadline is past the watermark).
    * `maxDelay` is a calendar-interval string, e.g. "10 minutes". */
  def attributionJoin(impressions: DataFrame, clicks: DataFrame, keyCol: String,
                      maxDelay: String, watermark: String = "1 hour",
                      joinType: String = "inner"): DataFrame = {
    require(keyCol != "ts", "attributionJoin keyCol must differ from the event-time column 'ts'")
    require(joinType == "inner" || joinType == "leftOuter",
      s"attributionJoin joinType must be inner or leftOuter, got $joinType")
    val imp = impressions.select(col(keyCol).as("imp_key"), col("ts").as("imp_ts"))
      .withWatermark("imp_ts", watermark)
    val clk = clicks.select(col(keyCol).as("clk_key"), col("ts").as("clk_ts"))
      .withWatermark("clk_ts", watermark)
    imp.join(clk,
      expr(s"""imp_key = clk_key AND
               clk_ts >= imp_ts AND clk_ts <= imp_ts + INTERVAL $maxDelay"""),
      joinType)
      .select(col("imp_key").as(keyCol), col("imp_ts"), col("clk_ts"))
  }

  /** The batch twin over static frames — the parity reference the spec
    * compares against (same condition, same projection). */
  def attributionJoinBatch(impressions: DataFrame, clicks: DataFrame, keyCol: String,
                           maxDelay: String, joinType: String = "inner"): DataFrame = {
    val imp = impressions.select(col(keyCol).as("imp_key"), col("ts").as("imp_ts"))
    val clk = clicks.select(col(keyCol).as("clk_key"), col("ts").as("clk_ts"))
    imp.join(clk,
      expr(s"""imp_key = clk_key AND
               clk_ts >= imp_ts AND clk_ts <= imp_ts + INTERVAL $maxDelay"""),
      joinType)
      .select(col("imp_key").as(keyCol), col("imp_ts"), col("clk_ts"))
  }
}
