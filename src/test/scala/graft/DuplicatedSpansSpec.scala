package graft

import graft.operators.Dedup

/** Semantic contract of [[Dedup.duplicatedSpans]] (the q210 ExactSubstr card)
  * on hand-computed fixtures: overlapping dup grams merge into one maximal
  * span, touching extents (gap exactly n) merge, disjoint extents stay two
  * spans, within-doc-only repetition does NOT count (cross-doc contract),
  * and clean docs come back zero-filled.
  */
class DuplicatedSpansSpec extends SparkSpec {
  import spark.implicits._

  // docs 1,2 share the 8-token run "a b c d e f g h" (dup trigram positions
  // 1..6 → ONE merged island of 8 tokens); doc 3 is clean; doc 4 carries the
  // shared "a b c" twice, 7 apart (> n → TWO 3-token spans); doc 5 repeats a
  // phrase only within itself (df = 1 → not duplicated); docs 6,7 share two
  // phrases that TOUCH in doc 6 (dup positions 1 and 4, gap exactly n=3 →
  // merged) but sit 6 apart in doc 7 (two spans).
  private def docs = Seq(
    (1L, "a b c d e f g h u1 u2"),
    (2L, "a b c d e f g h v1 v2"),
    (3L, "w1 w2 w3 w4 w5"),
    (4L, "a b c x1 x2 x3 x4 a b c"),
    (5L, "p q r s p q r s"),
    (6L, "g1 g2 g3 h1 h2 h3"),
    (7L, "g1 g2 g3 q1 q2 q3 h1 h2 h3")
  ).toDF("doc_id", "text")

  test("duplicatedSpans: island merge, touching merge, cross-doc contract, zero-fill") {
    val out = Dedup.duplicatedSpans(docs, n = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out.size == 7) // one row per input doc
    // (n_tokens, n_spans, dup_tokens, max_span, dup_frac_ppm)
    assert(out(1L) == ((10L, 1L, 8L, 8L, 800000L))) // positions 1..6 merge to one 8-token span
    assert(out(2L) == ((10L, 1L, 8L, 8L, 800000L)))
    assert(out(3L) == ((5L, 0L, 0L, 0L, 0L)))       // clean doc, zero-filled
    assert(out(4L) == ((10L, 2L, 6L, 3L, 600000L))) // gap 7 > n: two disjoint 3-token spans
    assert(out(5L) == ((8L, 0L, 0L, 0L, 0L)))       // within-doc repeat only: df = 1, not dup
    assert(out(6L) == ((6L, 1L, 6L, 6L, 1000000L))) // gap exactly n: extents touch, merge
    assert(out(7L) == ((9L, 2L, 6L, 3L, 666666L)))  // same phrases 6 apart: two spans, floor ppm
  }

  test("duplicatedSpans: minDocs raises the duplication bar") {
    // "a b c" is in docs 1, 2, 4 (df = 3); the rest of the 1-2 run has df = 2.
    val out = Dedup.duplicatedSpans(docs, n = 3, minDocs = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(out(1L) == ((1L, 3L))) // only the "a b c" extent survives
    assert(out(4L) == ((2L, 6L))) // both of doc 4's copies still count
    assert(out(6L) == ((0L, 0L)))
  }
}
