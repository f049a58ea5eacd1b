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
}
