package graft.streaming

import graft.functions.Exprs
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q228's first-seen novelty card — the ingest-time
  * monitor a continuous crawl runs: as documents arrive, what fraction of
  * each one's distinct 8-grams has never been seen before? A falling
  * novelty rate is the "crawl exhausted / feed looping" alarm, the same
  * signal q228 reads retrospectively in doc_id order.
  *
  * Shape (the [[StreamingDedup]] posture): grams are built *inside each
  * row* (tokens and the shingle array each in their own projection — the
  * minhashBandSigsFromShingles performance contract), exploded, and grouped
  * by GRAM; the per-gram state is the first holder's doc id (one long — the
  * state store carries the gram space, partitioned by the same content key
  * the batch census shuffles on, no hot driver-side structure). Each
  * arrival emits one attribution row (docId, gram, first); the per-doc
  * card is a STATELESS rollup of those rows ([[noveltyCard]]) — run per
  * micro-batch via foreachBatch or as a downstream job, exactly like the
  * batch operator's doc-keyed aggregate (a second stateful operator after
  * flatMapGroupsWithState would need an event-time watermark this feed
  * doesn't have; documented, not hidden).
  *
  * Contract (StreamingNoveltySpec pins both):
  *   - attribution is FIRST-ARRIVAL: when arrivals are doc_id-ordered (the
  *     crawl-order replay q228 models), the first=true set is exactly the
  *     batch card's first-occurrence attribution — per-gram AND per-doc
  *     parity, across micro-batch boundaries;
  *   - redelivery (at-least-once upstream) can only re-emit first=false
  *     rows — a gram's first=true attribution is stable once emitted.
  */
object StreamingNovelty {

  case class GramRow(gram: String, docId: Long)
  case class FirstSeen(firstDoc: Long)
  case class Attribution(docId: Long, gram: String, first: Boolean)

  /** One row per (doc, distinct 8-gram) — pure per-row expressions, works on
    * batch and streaming frames; gram definition identical to
    * [[graft.operators.Dedup.shingleSet]] (q228's census input). */
  def gramRows(docs: DataFrame, n: Int = 8): Dataset[GramRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), Exprs.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(array_distinct(Exprs.shingles(col("toks"), n))).as("gram"))
      .select(col("gram"), col("doc_id").as("docId"))
      .as[GramRow]
  }

  /** First-arrival attribution over a streaming (doc_id, text) frame:
    * (docId, gram, first) per distinct gram of each arriving doc, first =
    * this doc is the gram's first holder ever seen by the stream (within a
    * micro-batch, the smallest doc id of the batch — deterministic, and
    * equal to first-occurrence when the feed replays doc_id order). */
  def firstSeenAttribution(docs: DataFrame, n: Int = 8): Dataset[Attribution] = {
    import docs.sparkSession.implicits._
    gramRows(docs, n)
      .groupByKey(_.gram)
      .flatMapGroupsWithState[FirstSeen, Attribution](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (gram: String, rows: Iterator[GramRow], state: GroupState[FirstSeen]) =>
          val batch = rows.map(_.docId).toList.distinct.sorted
          val prior = state.getOption.map(_.firstDoc)
          val out = batch.map(d =>
            Attribution(d, gram, prior.isEmpty && d == batch.head))
          state.update(FirstSeen(prior.getOrElse(batch.head)))
          out.iterator
      }
  }

  /** The q228 card over an attribution frame (docId, gram, first) — a
    * stateless doc-keyed rollup: n_grams, n_first, novelty_ppm. Applied
    * per micro-batch (foreachBatch) or to the collected attribution table;
    * on the full doc_id-ordered replay it equals the batch q228 output.
    *
    * Redelivery-safe (ADVICE r12): an at-least-once upstream re-emits a
    * delivered doc's rows with first=false — including for grams whose
    * ORIGINAL row was first=true — so the card first collapses the frame
    * to one row per (doc, gram), keeping the max of `first` (a gram's
    * first=true attribution is stable once emitted, so the max is the
    * original verdict). Without the collapse a redelivered doc's n_grams
    * doubled and its novelty_ppm sank — invisible on clean replays, wrong
    * on the delivery semantics the operator documents. On an exactly-once
    * frame the collapse is a no-op (gramRows is distinct per delivery). */
  def noveltyCard(attr: DataFrame): DataFrame =
    attr.groupBy(col("docId").as("doc_id"), col("gram"))
      .agg(max(col("first")).as("first"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first"), 1L).otherwise(0L)).as("n_first"))
      .select(col("doc_id"), col("n_grams"), col("n_first"),
        expr("(1000000 * n_first) div n_grams").as("novelty_ppm"))
}
