package graft

import graft.operators.UnigramLm

/** Unigram-LM tokenizer (operators.UnigramLm): hard-EM training, Viterbi
  * segmentation, the roundtrip gate, and partitioning invariance. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  // "ab" is overwhelmingly frequent as a unit; "c"/"d" appear standalone —
  // EM should learn to segment "abc" as [ab, c], not [a, bc] or chars.
  private def corpus = Seq(
    (1L, "ab ab ab ab ab c d"),
    (2L, "ab ab abc abd"),
    (3L, "c d ab")
  ).toDF("doc_id", "text")

  test("viterbi segmentation prefers the frequent piece") {
    val seg = UnigramLm.segment(corpus, maxWordLen = 12, maxPieceLen = 4, rounds = 2)
      .as[(String, Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(seg.keySet == Set("ab", "c", "d", "abc", "abd"))
    assert(seg("ab")._3 == "ab", seg.toString) // single piece
    assert(seg("abc")._3 == "ab c", seg.toString)
    assert(seg("abd")._3 == "ab d", seg.toString)
    // the roundtrip gate holds for every word
    assert(seg.values.forall(_._4), seg.toString)
    // word counts ride through: "ab" appears 8 times
    assert(seg("ab")._1 == 8L)
  }

  test("trained model counts every Viterbi occurrence weighted by frequency") {
    val m = UnigramLm.train(corpus, maxWordLen = 12, maxPieceLen = 4, rounds = 2)
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // the seed prune: "abc"/"bc" occur once (< minSeedCount) and are not
    // single chars — dropped from the vocabulary; chars always survive
    assert(!m.contains("abc") && !m.contains("bc"))
    assert(m.contains("ab") && m.contains("b"))
    // "ab" is used by ab(8) + abc(1) + abd(1) = 10
    assert(m("ab")._1 == 10L, m("ab").toString)
    // unused survivors keep add-one mass: logp finite and below used
    assert(m("b")._1 == 0L)
    assert(m("b")._2 < m("ab")._2)
  }

  test("segmentation is invariant to partitioning") {
    val a = UnigramLm.segment(corpus.repartition(1), rounds = 2)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val b = UnigramLm.segment(corpus.repartition(7), rounds = 2)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("soft-EM expected counts: fractional mass, position coverage, ordering") {
    val hard = UnigramLm.train(corpus, rounds = 2)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    val soft = UnigramLm.trainEm(corpus, rounds = 2)
      .as[(String, Double, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(soft.keySet == hard.keySet)
    // total mass: Σ_pieces c·len(piece) = Σ_words cnt·len(word) — every
    // character position carries total posterior 1 (forward–backward
    // normalization), in both flavors up to the 8-dp ladder
    val totalChars = Seq("ab" -> 8, "c" -> 2, "d" -> 2, "abc" -> 1, "abd" -> 1)
      .map { case (w, n) => w.length * n }.sum.toDouble
    def mass(m: Map[String, Double]) = m.map { case (p, c) => c * p.length }.sum
    assert(math.abs(mass(soft) - totalChars) < 1e-5, s"soft mass ${mass(soft)} vs $totalChars")
    assert(math.abs(mass(hard.map { case (k, v) => k -> v.toDouble }) - totalChars) < 1e-9)
    // the dominant piece keeps nearly all its hard mass, but soft EM
    // spreads strictly positive mass onto the char-split alternatives
    assert(soft("ab") > 9.0 && soft("ab") < 10.0, soft("ab").toString)
    assert(soft("a") > 0.0 && soft("b") > 0.0)
  }

  test("words beyond maxWordLen are dropped; degenerate configs refused") {
    val seg = UnigramLm.segment(
      Seq((1L, "short verylongword12x ok")).toDF("doc_id", "text"),
      maxWordLen = 8, rounds = 1)
    val words = seg.select("word").as[String].collect().toSet
    assert(words == Set("short", "ok"))
    intercept[IllegalArgumentException](UnigramLm.train(corpus, rounds = 0))
  }
}
