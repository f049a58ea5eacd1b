package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability: named metrics collected *during* an action via
  * Spark's Observation API — zero extra passes over the data (the metrics
  * ride the existing job), which is the only affordable way to count
  * bad records in a 100 TB ingest.
  */
object Monitoring {

  /** Attach (rows, null_ts, malformed) ingest metrics to a parsed-log frame.
    * Read `obs.get` after any action on the returned frame. */
  def observedParse(parsed: DataFrame): (DataFrame, Observation) = {
    val obs = Observation("parse_metrics")
    val df = parsed.observe(obs,
      count(lit(1)).as("rows"),
      sum(when(col("ts").isNull, 1L).otherwise(0L)).as("null_ts"),
      sum(when(col("status").isNull, 1L).otherwise(0L)).as("null_status"))
    (df, obs)
  }
}
