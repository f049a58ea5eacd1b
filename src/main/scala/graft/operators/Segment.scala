package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dictionary-driven segmentation of *unsegmented* text (SURVEY.md §2.2 P11).
  *
  * The reference workload (PDF2 "金庸的江湖" pp. 6-7) tokenizes Chinese novels
  * — text with no word delimiters — by matching against a character-name
  * dictionary (Ansj-style). A whitespace tokenizer produces nothing on such
  * input, so this operator implements greedy longest-match (MaxMatch)
  * segmentation: scan left to right, at each position take the longest
  * dictionary word that matches, else advance one character.
  *
  * Spark-first shape: the dictionary is a plan-time literal array sorted by
  * (length desc, word asc) — the first filter survivor IS the longest match —
  * and the scan is one `aggregate` higher-order fold with a (pos, out) struct
  * accumulator, fully inside codegen; no UDF, no driver loop. Per-row cost is
  * O(len · |dict|): right for name-dictionary sizes (the reference's use
  * case). For 100k+-entry dictionaries the same contract would move to an
  * Aho-Corasick automaton built once per partition via `mapPartitions` — the
  * declared big-dict escape hatch, not needed at reference scale.
  *
  * Output: one (doc_id, name) row per matched occurrence, in scan order —
  * the same token-stream shape as [[TextPipeline.tokenize]], so the
  * co-occurrence → PageRank/LPA chain (A11-A12, G1-G2) consumes it directly.
  */
object Segment {

  /** Normalized unsegmented stream: lowercase, every non-alphanumeric
    * removed (not replaced by spaces — the point is there are no separators). */
  def despace(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9]", "")

  /** Greedy longest-match segmentation of `textCol` against `dict`. */
  def segment(docs: DataFrame, dict: Seq[String], textCol: String = "text",
              keep: Seq[String] = Seq("doc_id")): DataFrame = {
    require(dict.nonEmpty && dict.forall(_.nonEmpty), "dictionary words must be non-empty")
    val ordered = dict.distinct.sortBy(w => (-w.length, w))
    val dictLit = array(ordered.map(lit(_)): _*)
    val s = despace(col(textCol))
    val zero = struct(lit(1).as("pos"), array().cast("array<string>").as("out"))
    val folded = aggregate(
      sequence(lit(1), length(s)),
      zero,
      (acc, i) => {
        // longest dictionary word matching at position i (dict sorted by
        // length desc, so the first survivor is the longest); get() is the
        // ANSI-safe out-of-bounds accessor (null when no word matches)
        val m = get(filter(dictLit, w => s.substr(i, length(w)) === w), lit(0))
        when(i < acc.getField("pos"), acc)
          .otherwise(when(m.isNotNull,
            struct((i + length(m)).as("pos"),
              concat(acc.getField("out"), array(m)).as("out")))
            .otherwise(struct((i + 1).as("pos"), acc.getField("out").as("out"))))
      },
      acc => acc.getField("out"))
    docs.select(keep.map(col) :+ explode(folded).as("name"): _*)
  }
}
