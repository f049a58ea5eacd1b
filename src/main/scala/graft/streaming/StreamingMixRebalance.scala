package graft.streaming

import graft.functions.Exprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the q98 mixture rebalance: per-epoch sampling rates
  * recomputed as the watermark closes each event-time window.
  *
  * The batch operator's two halves split cleanly for streaming:
  *   1. RATES are a per-epoch aggregate — per-source counts within a
  *      tumbling event-time window, then the q98 ppm rule
  *      (min-count·1e6 div count, exact integer arithmetic) across the
  *      window's sources. Two chained streaming aggregations in append
  *      mode: a closed epoch emits its rate table once, when the
  *      watermark passes. This is the published artifact a production
  *      pipeline ships per epoch.
  *   2. SAMPLING stays the stateless md5-h60 coin against the rate —
  *      per-row, engine-portable, identical to batch (a doc's keep/drop
  *      depends only on its id and its epoch's rates, never on arrival
  *      order or partitioning). [[applyRates]] works on any frame, batch
  *      or stream, once the epoch's rates exist.
  *
  * Scale notes: state is one row per (epoch, source) in the first
  * aggregation and one per epoch in the second — both watermark-evicted,
  * never corpus-sized. The second aggregation's per-source collect_list
  * is bounded by the source cardinality (a mixture has tens of sources,
  * not millions). Cross-epoch rate smoothing (EMA over epochs) would be
  * a mapGroupsWithState extension; per-epoch rates are the exact q98
  * semantics and keep every epoch reproducible in isolation.
  */
object StreamingMixRebalance {

  /** Per-epoch q98 rate table for a stream with event-time `ts` and a
    * `source` column: (epoch_start, source, n_docs, rate_ppm), emitted in
    * append mode when the watermark closes the epoch. Works identically
    * on a batch frame (the parity twin in the spec). */
  def epochRates(stream: DataFrame, windowLen: String, watermark: String): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .groupBy(col("w"))
      .agg(min(col("n_docs")).as("min_docs"),
        collect_list(struct(col("source"), col("n_docs"))).as("per_source"))
      .select(col("w"), col("min_docs"), explode(col("per_source")).as("s"))
      .select(col("w.start").as("epoch_start"),
        col("s.source").as("source"), col("s.n_docs").as("n_docs"),
        least(lit(1000000L), expr("(1000000 * min_docs) DIV n_docs")).as("rate_ppm"))

  /** The stateless sampling half: join rows (tagged with their epoch
    * start) against an epoch rate table and apply the q98 hash coin.
    * `rows` needs (epoch_start, source, doc_id); rates are epoch-keyed
    * and small, so the join broadcasts. */
  def applyRates(rows: DataFrame, rates: DataFrame): DataFrame =
    rows.join(broadcast(rates.select(col("epoch_start"), col("source"), col("rate_ppm"))),
        Seq("epoch_start", "source"))
      .filter(Exprs.h60(concat(lit("mix:"), col("doc_id"))) % 1000000L < col("rate_ppm"))

  /** Tag rows with their tumbling-epoch start (the join key for
    * [[applyRates]]) — same window arithmetic as [[epochRates]]. */
  def withEpoch(rows: DataFrame, windowLen: String): DataFrame =
    rows.withColumn("epoch_start", window(col("ts"), windowLen).getField("start"))
}
