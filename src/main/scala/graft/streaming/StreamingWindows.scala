package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming shape of the windowed aggregations (SURVEY.md §2.7 W1).
  *
  * The batch queries bucket by `date_trunc`; the streaming twin uses the
  * equivalent `window()` tumbling windows plus a watermark so state is bounded
  * and late data past the watermark is dropped. The input can be any streaming
  * DataFrame with an event-time `ts` column (file source, rate source, or
  * MemoryStream in tests).
  */
object StreamingWindows {

  /** Tumbling-window counts per key over an event-time column. */
  def windowedCounts(stream: DataFrame, keyCol: String, windowLen: String,
                     watermark: String = "1 hour"): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("cnt"))

  /** Tumbling-window average of a value column per key. */
  def windowedAvg(stream: DataFrame, keyCol: String, valueCol: String,
                  windowLen: String, watermark: String = "1 hour"): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("cnt"), avg(col(valueCol)).as("avg_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("cnt"), col("avg_value"))
}
