package graft.operators

import graft.functions.Exprs._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document line-level deduplication — the C4/RefinedWeb boilerplate
  * pass: a line that occurs verbatim in many documents (navigation chrome,
  * cookie banners, license footers) is kept at its FIRST corpus occurrence
  * and removed everywhere else, then documents are reassembled from their
  * surviving lines.
  *
  * This complements the document-level family in [[Dedup]]: near-dup pairs
  * (q33/q34/q35) find whole documents that resemble each other; line dedup
  * removes repeated fragments from documents that are otherwise unique —
  * the dominant cleanup on web corpora (C4 §2.2 removed ~5% of tokens this
  * way at three-sentence-span granularity).
  *
  * Scale shape (100 TB): no occurrence-level join anywhere — the survivors
  * of keep-first dedup are by definition the per-line first occurrences, so
  * one min-struct aggregate keyed on the line's md5 yields them directly,
  * with map-side partial aggregation collapsing hot boilerplate lines to one
  * row per map task BEFORE the exchange (the skew a join-back formulation
  * would have had lands on no reducer at all). Per-doc totals come from a
  * second shuffle that carries only (doc_id) — no line bodies — and the two
  * per-doc frames meet in a same-keyed join. Grouping is on md5(line), so
  * reducers compare 32-byte keys, not arbitrary-length bodies.
  */
object LineDedup {

  /** Fixed-width token chunks of a text column: span i covers tokens
    * [i*w, (i+1)*w). The deterministic stand-in for sentence/line boundaries
    * on corpora without them (C4 uses three-sentence spans; the synthetic
    * corpus has no sentence marks, so width-w spans are the analogue). */
  def chunkTokens(tk: Column, width: Int): Column = {
    val nspans = ceil(size(tk).cast("double") / width).cast("int")
    when(nspans > 0,
      transform(sequence(lit(0), nspans - lit(1)),
        i => array_join(slice(tk, i * width + lit(1), lit(width)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Convenience over raw text. HOF-CSE contract (the q34 lesson): this
    * references its token argument O(n_spans) times, so on a hot path the
    * caller MUST project `tokens(text)` into its own column first and call
    * [[chunkTokens]] on the attribute — passing the raw tokenizer expression
    * here re-runs the regex split once per span. */
  def chunkLines(text: Column, width: Int): Column = chunkTokens(tokens(text), width)

  /** (doc_id, line_no, line) rows from a `lines` array column. */
  def explodeLines(docs: DataFrame, linesCol: Column): DataFrame =
    docs.select(col("doc_id"), posexplode(linesCol).as(Seq("line_no", "line")))

  /** Keep-first line dedup over (doc_id, line_no, line) rows: every line
    * occurrence except the corpus-first (min (doc_id, line_no)) is dropped,
    * and documents are reassembled from the survivors in original order.
    *
    * Output: (doc_id, n_lines, n_removed, clean_text) — one row per input
    * document that has at least one line.
    */
  def dedupLines(lines: DataFrame): DataFrame = {
    // The survivors are EXACTLY the per-hash first occurrences, so no
    // occurrence-level join back is needed: one min-struct aggregate picks
    // each line's surviving (doc, position, body) — map-side partials reduce
    // a boilerplate line in 30% of all docs to one row per map task, which
    // is also what removes the hot-key skew a join-back would have — and a
    // second, bodies-free count shuffle supplies per-doc totals.
    val firsts = lines
      .groupBy(md5(col("line")).as("h"))
      .agg(min(struct(col("doc_id"), col("line_no"), col("line"))).as("first"))
      .select(col("first.doc_id").as("doc_id"), col("first.line_no").as("line_no"),
        col("first.line").as("line"))
    val kept = firsts.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("line_no"), col("line")))),
            s => s.getField("line")),
          "\n").as("clean_text"))
    val totals = lines.groupBy(col("doc_id")).agg(count(lit(1)).as("n_lines"))
    totals.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
