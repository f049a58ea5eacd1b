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

  /** Normalized unsegmented stream: lowercase, every non-letter/non-number
    * removed (not replaced by spaces — the point is there are no separators).
    * Unicode classes, not [a-z0-9]: the reference workload's input is Chinese
    * novel text (PDF2 pp. 2, 6-7), and an ASCII-only normalizer would silently
    * delete every CJK character — segment() would return zero rows on exactly
    * the corpus this operator exists for. \p{L}\p{N} keeps all scripts.
    * (Positions are UTF-16 code units in the native scan — identical to code
    * points for BMP text; supplementary-plane chars can't match a BMP
    * dictionary and are skipped harmlessly.) */
  def despace(text: Column): Column =
    regexp_replace(lower(text), "[^\\p{L}\\p{N}]", "")

  /** Greedy longest-match segmentation of `textCol` against `dict`, via the
    * native [[graft.functions.GreedySegment]] expression (tight JVM scan, one
    * interpreted call per row — ~50× the HOF formulation's throughput).
    * [[segmentHof]] is the pure-Catalyst twin kept as a cross-check oracle. */
  def segment(docs: DataFrame, dict: Seq[String], textCol: String = "text",
              keep: Seq[String] = Seq("doc_id")): DataFrame =
    docs.select(keep.map(col) :+
      explode(graft.functions.GreedySegment(despace(col(textCol)), dict)).as("name"): _*)

  /** HOF twin of [[segment]]: (1) per dictionary word, scan all occurrence
    * positions (a filter over character positions — the O(len·|dict|) work);
    * (2) sort the sparse (pos, rank) match list and greedily fold over IT.
    * Taking the first match with pos ≥ cursor from the (pos asc,
    * longest-first) order is exactly MaxMatch. Interpreted-lambda cost per
    * (char × word) makes this the slow reference path — kept for test parity
    * with the native expression, mirroring dot/dotHof. */
  def segmentHof(docs: DataFrame, dict: Seq[String], textCol: String = "text",
                 keep: Seq[String] = Seq("doc_id")): DataFrame = {
    require(dict.nonEmpty && dict.forall(_.nonEmpty), "dictionary words must be non-empty")
    val ordered = dict.distinct.sortBy(w => (-w.length, w))
    val rankToWord = array(ordered.map(lit(_)): _*)
    val s = despace(col(textCol))
    // rank = position in the (length desc, word asc) order, so an ascending
    // struct sort puts the longest candidate first at every position
    val matchArrays = ordered.zipWithIndex.map { case (w, r) =>
      transform(
        filter(sequence(lit(1), length(s)), i => s.substr(i, lit(w.length)) === w),
        i => struct(i.as("pos"), lit(r).as("rank")))
    }
    val all = array_sort(flatten(array(matchArrays: _*)))
    def word(m: Column) = element_at(rankToWord, m.getField("rank") + 1)
    val zero = struct(lit(1).as("pos"), array().cast("array<string>").as("out"))
    val folded = aggregate(all, zero, (acc, m) =>
      when(m.getField("pos") < acc.getField("pos"), acc)
        .otherwise(struct(
          (m.getField("pos") + length(word(m))).as("pos"),
          concat(acc.getField("out"), array(word(m))).as("out"))),
      acc => acc.getField("out"))
    docs.select(keep.map(col) :+ explode(folded).as("name"): _*)
  }
}
