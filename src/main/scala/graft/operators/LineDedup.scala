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
  * Scale shape (100 TB): three equi-key shuffles, nothing driver-sized —
  *   1. explode lines (scan-local),
  *   2. groupBy line-hash → (first occurrence, count) with map-side partial
  *      aggregation (a boilerplate line in 30% of all docs partial-aggregates
  *      to one row per map task before the exchange),
  *   3. join lines back on the hash (AQE skew-join splits the hot keys: a
  *      mega-common line lands all its occurrence rows on one reducer
  *      otherwise), then one groupBy(doc_id) to reassemble.
  * Lines are joined on their md5 rather than raw text so the wide exchange
  * carries 32-byte keys, not full line bodies.
  */
object LineDedup {

  /** Fixed-width token chunks of a text column: span i covers tokens
    * [i*w, (i+1)*w). The deterministic stand-in for sentence/line boundaries
    * on corpora without them (C4 uses three-sentence spans; the synthetic
    * corpus has no sentence marks, so width-w spans are the analogue). */
  def chunkLines(text: Column, width: Int): Column = {
    val tk = tokens(text)
    val nspans = ceil(size(tk).cast("double") / width).cast("int")
    when(nspans > 0,
      transform(sequence(lit(0), nspans - lit(1)),
        i => array_join(slice(tk, i * width + lit(1), lit(width)), " ")))
      .otherwise(array().cast("array<string>"))
  }

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
    val hashed = lines.withColumn("h", md5(col("line")))
    val firsts = hashed.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("line_no"))).as("first"))
    hashed.join(firsts, "h")
      .withColumn("keep",
        col("doc_id") === col("first.doc_id") && col("line_no") === col("first.line_no"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("keep"), lit(0L)).otherwise(lit(1L))).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"), struct(col("line_no"), col("line"))))),
            s => s.getField("line")),
          "\n").as("clean_text"))
  }
}
