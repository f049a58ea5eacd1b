package graft.streaming

import graft.functions.Exprs
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming twin of q211's winnowing overlap: flag incoming documents that
  * share at least `minShared` winnowing fingerprints (Schleimer et al. 2003)
  * with a FIXED reference corpus — the ingest-time plagiarism/containment
  * gate (licensed books, eval suites, any content that must not re-enter a
  * training shard), with per-(doc, reference-doc) attribution matching the
  * batch operator's pair contract.
  *
  * The reference side is fixed-size by definition (the q73/q199/
  * StreamingDecontam broadcast contract), materialized ONCE into an
  * fp → sorted-reference-doc-ids literal. The stream side is completely
  * STATELESS: [[graft.functions.WinnowSelect]] makes fingerprint selection
  * a row-local expression (a doc's fingerprints depend only on its own tokens),
  * so flagging is per-row work — append mode, no shuffle, no state store,
  * unconditionally scalable on the stream.
  *
  * Batch/stream parity: the streamed pair set equals
  * [[Dedup.winnowedOverlapPairs]] restricted to (stream doc × reference
  * doc) pairs with the SAME shared-fp counts (StreamingWinnowingSpec
  * asserts it across micro-batch waves and under redelivery — verdicts are
  * per-row deterministic, so replays emit identical rows).
  */
object StreamingWinnowing {

  /** Materialize the reference corpus's fp → sorted doc-ids lookup.
    * Bounded by the reference set (winnowing thins its gram stream to
    * ~2/(w+1) before this collect — the Bloom.scala bounded-collect
    * precedent, NOT corpus-scale). */
  def referenceIndex(refDocs: DataFrame, k: Int, w: Int): Map[Long, Seq[Long]] =
    Dedup.winnowFingerprints(refDocs, k, w)
      .select(col("fp"), col("doc_id")).collect()
      .groupBy(_.getLong(0)).map { case (fp, rows) =>
        fp -> rows.map(_.getLong(1)).distinct.sorted.toSeq
      }

  /** Flag + attribute overlapping docs on a (doc_id, text) stream (or a
    * batch frame — the parity twin). Emits one row per (incoming doc,
    * reference doc) pair sharing ≥ minShared fingerprints:
    * (doc_id, ref_doc, n_shared_fp). Tokens, hashes and window mins each
    * get their own projection (the q73 retokenize-trap discipline / the
    * HOF-CSE contract). */
  def flag(docs: DataFrame, index: Map[Long, Seq[Long]], k: Int, w: Int,
           minShared: Long): DataFrame = {
    val lookup = typedlit(index)
    docs
      .select(col("doc_id"), Exprs.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(graft.functions.WinnowSelect(col("toks"), k, w)).as("fps"))
      .select(col("doc_id"),
        filter(col("fps"), f => element_at(lookup, f).isNotNull).as("hits"))
      .filter(size(col("hits")) > 0)
      // refs: one entry per (hit fp, owning ref doc) — per-pair counts are
      // occurrence counts of each ref id (fps are distinct per doc, so a
      // ref id appears once per shared fingerprint)
      .select(col("doc_id"),
        flatten(transform(col("hits"), f => element_at(lookup, f))).as("refs"))
      .select(col("doc_id"), explode(array_distinct(col("refs"))).as("ref_doc"),
        col("refs"))
      .select(col("doc_id"), col("ref_doc"),
        size(filter(col("refs"), r => r === col("ref_doc")))
          .cast(LongType).as("n_shared_fp"))
      .filter(col("n_shared_fp") >= minShared)
  }
}
