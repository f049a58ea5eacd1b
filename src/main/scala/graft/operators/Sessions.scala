package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Inactivity-gap sessionization over an event stream: a new session starts
  * when the gap to the previous event of the same key exceeds `gapSec`.
  *
  * Pure window arithmetic (lag + running sum with the default RANGE frame,
  * which treats same-timestamp peers identically on every engine — that is
  * what keeps session ids deterministic under ties). One shuffle on the key.
  */
object Sessions {

  /** events: (key, sec: Long epoch-seconds). Output: one row per session —
    * (key, session_id, session_start, duration_sec, n_events). */
  def sessionize(events: DataFrame, gapSec: Long): DataFrame = {
    val byTime = Window.partitionBy(col("key")).orderBy(col("sec").asc)
    val newSess = when(
      lag(col("sec"), 1).over(byTime).isNull ||
        (col("sec") - lag(col("sec"), 1).over(byTime)) > gapSec, 1L).otherwise(0L)
    events
      .withColumn("_new", newSess)
      // default frame = RANGE UNBOUNDED PRECEDING → same-sec peers share ids
      .withColumn("session_id", sum(col("_new")).over(byTime).cast(LongType))
      .groupBy(col("key"), col("session_id"))
      .agg(min(col("sec")).as("session_start"),
        (max(col("sec")) - min(col("sec"))).as("duration_sec"),
        count(lit(1)).as("n_events"))
  }
}
