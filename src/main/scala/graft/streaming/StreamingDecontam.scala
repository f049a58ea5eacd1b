package graft.streaming

import graft.functions.Exprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of q199's exact n-gram decontamination: flag incoming
  * training documents whose text shares any exact n-gram with a FIXED
  * benchmark suite, with per-doc attribution (how many grams, which
  * benchmark docs, the first one) — the ingest-time gate that keeps eval
  * contamination from ever landing in a training shard.
  *
  * The benchmark side is an eval suite: fixed-size BY DEFINITION at any
  * corpus scale (the q73/q199 broadcast contract). It is therefore
  * materialized ONCE into a gram → sorted-benchmark-doc-ids lookup and
  * embedded as a map literal, making the streaming operator completely
  * STATELESS — per-row Column expressions, append mode, no shuffle, no
  * state store, unconditionally scalable on the stream side. (The collect
  * is bounded by the benchmark suite's gram count — the Bloom.scala
  * bounded-collect precedent — NOT by the corpus.)
  *
  * Batch/stream parity is exact and order-independent: a doc's verdict
  * depends only on its own text and the static suite, so the streamed
  * result set equals q199's batch semantics row for row
  * (StreamingDecontamSpec asserts it across micro-batch waves).
  */
object StreamingDecontam {

  /** Materialize the benchmark suite's gram → sorted doc-ids lookup from a
    * static (doc_id, text) frame. Bounded by the suite size; sorted ids
    * make downstream attribution deterministic. */
  def benchmarkGrams(benchDocs: DataFrame, n: Int = 8): Map[String, Seq[Long]] = {
    val sh = benchDocs
      .select(col("doc_id"), Exprs.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(Exprs.shingles(col("toks"), n))).as("shingle"))
      .collect()
    sh.groupBy(_.getString(1)).map { case (g, rows) =>
      g -> rows.map(_.getLong(0)).distinct.sorted.toSeq
    }
  }

  /** Span-surgery EMISSION on a (doc_id, text) stream — the streaming twin
    * of q238 (VERDICT r13 #4): q238 closes the batch decontamination loop
    * (flag → account → emit the cleaned corpus); this is the same cut at
    * ingest time, so a contaminated doc lands in the training shard
    * already cleaned instead of being quarantined for a batch pass. Emits
    * only contaminated docs — clean docs pass the gate untouched upstream
    * — with q238's exact schema: (doc_id, n_before, n_removed, n_after,
    * clean_text).
    *
    * The algebra is q238's, re-expressed row-locally (which is what makes
    * it embarrassingly STATELESS): hit positions come from an
    * indexed-lambda scan of the doc's own gram array against the broadcast
    * suite map (no posexplode→join→groupBy — that chain is the batch
    * shape; a single row needs no shuffle to collapse its own positions),
    * the cut set is the union of [p, p+n-1] ranges over hits, and the
    * survivors reassemble via the same indexed-lambda filter q238 uses.
    * Per-row Column expressions only, append mode, no state store, no
    * shuffle — unconditionally scalable on the stream side
    * (StreamingDecontamSpec asserts zero stateful operators AND exact
    * batch parity against q238's own output on a doc_id-ordered replay). */
  def surgeryEmit(docs: DataFrame, bench: Map[String, Seq[Long]], n: Int = 8): DataFrame = {
    val lng = org.apache.spark.sql.types.LongType
    val lookup = typedlit(bench)
    docs
      .select(col("doc_id"), Exprs.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), Exprs.shingles(col("toks"), n).as("grams"))
      // 1-based positions of flagged grams; transform's index lambda is
      // 0-based, and the -1 sentinel keeps the element type non-nullable
      .select(col("doc_id"), col("toks"),
        filter(
          transform(col("grams"),
            (g, i) => when(element_at(lookup, g).isNotNull, i + 1).otherwise(lit(-1))),
          p => p > 0).as("hitp"))
      .filter(size(col("hitp")) > 0)
      .select(col("doc_id"), col("toks"),
        array_sort(array_distinct(flatten(transform(col("hitp"),
          p => sequence(p.cast(lng), (p + lit(n - 1)).cast(lng)))))).as("cut"))
      .select(col("doc_id"),
        size(col("toks")).cast(lng).as("n_before"),
        size(col("cut")).cast(lng).as("n_removed"),
        (size(col("toks")) - size(col("cut"))).cast(lng).as("n_after"),
        array_join(
          filter(col("toks"),
            (_, i) => !array_contains(col("cut"), (i + lit(1)).cast(lng))),
          " ").as("clean_text"))
  }

  /** Flag + attribute contaminated docs on a (doc_id, text) stream (or a
    * batch frame — the parity twin). Emits only contaminated docs:
    * (doc_id, n_hit_grams, n_bench_docs, first_bench_doc). Tokens get
    * their own projection (the q73 retokenize-trap discipline). */
  def flag(docs: DataFrame, bench: Map[String, Seq[Long]], n: Int = 8): DataFrame = {
    val lookup = typedlit(bench)
    docs
      .select(col("doc_id"), Exprs.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(Exprs.shingles(col("toks"), n)).as("grams"))
      .select(col("doc_id"),
        filter(col("grams"), g => element_at(lookup, g).isNotNull).as("hits"))
      .filter(size(col("hits")) > 0)
      .select(col("doc_id"), col("hits"),
        array_distinct(flatten(transform(col("hits"),
          g => element_at(lookup, g)))).as("bd"))
      .select(col("doc_id"),
        size(col("hits")).cast("long").as("n_hit_grams"),
        size(col("bd")).cast("long").as("n_bench_docs"),
        array_min(col("bd")).as("first_bench_doc"))
  }
}
