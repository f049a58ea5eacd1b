package graft.streaming

import graft.functions.MultiPatternCount
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of q213's Aho–Corasick blocklist scan: flag incoming
  * documents containing blocklist phrases at ingest time, with per-phrase
  * occurrence counts — the gate that keeps listed content out of a
  * training shard before it lands.
  *
  * The automaton is a plan-time constant inside [[MultiPatternCount]]
  * (the phrase list is configuration, fixed-size at any corpus scale), so
  * the operator is completely STATELESS: per-row expressions + a
  * generator, append mode, no shuffle, no state store — the
  * StreamingDecontam posture. A doc's verdict depends only on its own
  * text and the static list, so batch/stream parity is exact and
  * order-independent (StreamingBlocklistSpec asserts it across waves).
  */
object StreamingBlocklist {

  /** Per-(doc, phrase) hit rows on a (doc_id, text) stream (or a batch
    * frame — the parity twin): (doc_id, phrase, n_occ), only hits emitted.
    * Counts are overlapping-match counts, aligned with q213's semantics. */
  def flag(docs: DataFrame, phrases: Seq[String]): DataFrame =
    docs
      .select(col("doc_id"), MultiPatternCount(lower(col("text")), phrases).as("c"))
      .select(col("doc_id"), posexplode(col("c")).as(Seq("pid", "n")))
      .filter(col("n") > 0)
      .select(col("doc_id"),
        element_at(typedlit(phrases), col("pid").cast("int") + 1).as("phrase"),
        col("n").as("n_occ"))
}
