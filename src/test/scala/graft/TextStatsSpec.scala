package graft

import graft.operators.TextStats

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("quality stats: hand-computed ratios") {
    val docs = Seq((1L, "The cat cat!")).toDF("doc_id", "text")
    val q = TextStats.quality(docs).collect().head
    assert(q.getAs[Long]("n_tokens") == 3L)
    assert(q.getAs[Long]("n_distinct") == 2L)
    assert(q.getAs[Double]("ttr") == 2.0 / 3.0)
    assert(q.getAs[Double]("avg_token_len") == 3.0)          // (3+3+3)/3
    assert(q.getAs[Double]("stopword_ratio") == 1.0 / 3.0)   // "the"
    // raw len 12, clean strips 'T'→t? lower() first: "the cat cat!" → strips '!' → 11
    assert(q.getAs[Double]("nonalnum_ratio") == 1.0 / 12.0)
    assert(q.getAs[Double]("quality") ==
      (2.0 / 3.0) * 0.4 + (3.0 / 100.0) * 0.4 + (1.0 - 1.0 / 3.0) * 0.2)
  }

  test("language id picks the marker-richest language, deterministic ties") {
    val docs = Seq(
      (1L, "the cat and the dog is here"),   // en markers
      (2L, "der hund und die katze ist da"), // de markers
      (3L, "xyzzy qwerty")                   // no markers → und
    ).toDF("doc_id", "text")
    val pred = TextStats.languageId(docs)
      .select($"doc_id", $"pred_lang").as[(Long, String)].collect().toMap
    assert(pred == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("token counts: whitespace vs BPE-ish regex") {
    val docs = Seq((1L, "hello world-42 ok")).toDF("doc_id", "text")
    val r = TextStats.tokenCounts(docs).as[(Long, Long, Long)].collect().head
    assert(r._2 == 3L) // whitespace tokens
    assert(r._3 == 5L) // hello | world | - | 42 | ok
  }

  test("fingerprint: hand-computed rolling hash") {
    val docs = Seq((1L, "ab cd"), (2L, ""), (3L, "ab")).toDF("doc_id", "text")
    val fp = TextStats.fingerprint(docs).as[(Long, Long)].collect().toMap
    // vals: ab → 2*31+97 = 159, cd → 2*31+99 = 161; fold: 159*131+161 = 20990
    assert(fp(1L) == 20990L)
    assert(fp(2L) == 0L)
    assert(fp(3L) == 159L)
  }

  test("char-LM perplexity equals an in-memory reference and ranks gibberish above prose") {
    val texts = Map(
      1L -> "the cat sat on the mat and the dog sat on the rug",
      2L -> "the rat sat on the mat and the cat ran to the dog",
      3L -> "zq xv jw qk zx vq wj kq xz qv",  // gibberish: unseen-elsewhere trigrams
      4L -> "no")                              // < 3 chars after normalize → dropped
    val docs = texts.toSeq.map { case (id, t) => (id, "en", t) }.toDF("doc_id", "lang", "text")
    val out = TextStats.charLmPerplexity(docs)
      .as[(Long, String, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._3, r._4, r._5)).toMap

    // independent in-memory reference of the full train+score chain
    val clean = texts.view.mapValues(
      _.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim)
      .toMap.filter(_._2.length >= 3)
    val docTris = clean.view.mapValues(c => (0 to c.length - 3).map(i => c.substring(i, i + 3))).toMap
    val cnt = docTris.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = cnt.values.sum
    val d = cnt.size
    def logp(tg: String) =
      BigDecimal(math.log((cnt(tg) + 1).toDouble / (total + d).toDouble))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)
    for ((id, tris) <- docTris) {
      val s = tris.map(logp).sum.toDouble
      val nll = -s / tris.size
      val (nTri, avgNll, ppl) = out(id)
      assert(nTri == tris.size.toLong, s"doc $id")
      assert(math.abs(avgNll - nll) < 1e-8, s"doc $id: $avgNll vs $nll")
      assert(math.abs(ppl - math.exp(nll)) < 1e-6, s"doc $id")
    }
    assert(!out.contains(4L))
    // the filter signal: out-of-distribution text scores far above prose
    assert(out(3L)._3 > 2 * out(1L)._3 && out(3L)._3 > 2 * out(2L)._3)
  }
}
