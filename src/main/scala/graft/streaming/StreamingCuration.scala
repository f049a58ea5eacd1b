package graft.streaming

import graft.functions.Exprs
import graft.operators.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end streaming corpus curation: the per-row cleanup chain a batch
  * pipeline runs (markup strip → PII redaction → minimum-length gate)
  * composed with exact content dedup, on a continuous document stream.
  *
  * Everything before the dedup is a stateless per-row expression — the
  * same `TextStats` columns the batch queries use (q86, q74, q40 gates),
  * which is the point: a curation library whose stages are Column
  * expressions is streaming-compatible for free. The ONLY stateful
  * operator is `dropDuplicates` on the cleaned-content hash, so the query
  * stays inside Spark's single-stateful-operator comfort zone.
  *
  * Scale notes, documented not hidden:
  *   - dedup state is one entry per DISTINCT cleaned document, partitioned
  *     by the hash — it partitions with the shuffle like the batch
  *     groupBy, but grows with corpus size. Production bounds it with an
  *     event-time watermark + `dropDuplicatesWithinWatermark` (dedup only
  *     within the reorder horizon) once the stream carries event time.
  *   - WHICH duplicate survives is arrival-order-dependent (first wins);
  *     batch resolves ties arbitrarily too unless it groups by hash and
  *     aggregates — parity is therefore on the surviving CONTENT set, not
  *     on surviving doc ids (StreamingCurationSpec asserts exactly that).
  */
object StreamingCuration {

  /** Clean, gate, and exactly-dedup a (doc_id, text) stream. Works
    * identically on a batch frame (the parity twin in the spec). */
  def curate(docs: DataFrame, minTokens: Int = 5): DataFrame =
    cleaned(docs, minTokens)
      .dropDuplicates("content_hash")
      .select(col("doc_id"), col("content_hash"), col("n_tok"), col("clean"))

  /** The bounded-state production variant: dedup state is evicted at the
    * event-time watermark (`dropDuplicatesWithinWatermark`), so the state
    * store holds only the reorder horizon instead of every distinct
    * document ever seen. The documented tradeoff: a duplicate arriving
    * AFTER its original has aged past the watermark is re-emitted — at
    * 100 TB the horizon-bounded store is what actually runs, with a
    * periodic batch dedup (q32/q72) sweeping the tail. */
  def curateWithWatermark(docs: DataFrame, eventTimeCol: String, delay: String,
                          minTokens: Int = 5): DataFrame =
    cleaned(docs, minTokens)
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("doc_id"), col(eventTimeCol), col("content_hash"),
        col("n_tok"), col("clean"))

  private def cleaned(docs: DataFrame, minTokens: Int): DataFrame =
    docs
      .withColumn("clean", TextStats.redactPii(TextStats.stripMarkup(col("text"))))
      .withColumn("n_tok", size(Exprs.tokens(col("clean"))).cast("long"))
      .filter(col("n_tok") >= minTokens)
      .withColumn("content_hash", xxhash64(col("clean")))
}
