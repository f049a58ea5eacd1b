package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  // corpus: 1 ≈ 2 (near-dup pair that must NOT be re-reported — both are old),
  // 3 unrelated. batch: 101 near-dup of 1 (batch×corpus), 102 ≡ 103
  // (batch×batch), 104 unrelated.
  private def corpus = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog today"),
    (2L, "en", "the quick brown fox jumps over the lazy dog now"),
    (3L, "en", "completely different content with no overlap at all whatsoever")
  ).toDF("doc_id", "lang", "text")

  private def batch = Seq(
    (101L, "en", "the quick brown fox jumps over the lazy cat today"),
    (102L, "en", "fresh batch document about stellar parallax measurement tables"),
    (103L, "en", "fresh batch document about stellar parallax measurement tables"),
    (104L, "en", "unrelated ingest noise with entirely novel vocabulary herein")
  ).toDF("doc_id", "lang", "text")

  test("incremental pairs = full-corpus pairs restricted to batch-touching, corpus×corpus never re-reported") {
    val inc = Dedup.incrementalMinhashPairs(corpus, batch, threshold = 0.3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val full = Dedup.minhashLshPairs(corpus.unionByName(batch), threshold = 0.3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val batchIds = Set(101L, 102L, 103L, 104L)
    val expected = full.filter { case ((a, b), _) => batchIds(a) || batchIds(b) }
    assert(inc == expected)
    // the old pair (1,2) is in the full answer but not the incremental one
    assert(full.contains((1L, 2L)) && !inc.contains((1L, 2L)))
    // both directions found: batch probing corpus and batch probing batch
    assert(inc.contains((1L, 101L)) && inc((102L, 103L)) == 1.0)
  }

  test("bucket census spans the full index: a corpus-dense bucket is capped for the probe too") {
    // 70 identical corpus docs flood every band bucket past the cap; the
    // batch doc identical to them must NOT report 70 candidate partners
    val flood = (1L to 70L).map(i => (i, "en",
      "identical boilerplate header repeated across the whole crawl segment"))
      .toDF("doc_id", "lang", "text")
    val b = Seq((901L, "en",
      "identical boilerplate header repeated across the whole crawl segment"))
      .toDF("doc_id", "lang", "text")
    val capped = Dedup.incrementalMinhashPairs(flood, b, threshold = 0.5,
      maxBucketSize = Some(64))
      .as[(Long, Long, Double)].collect()
    assert(capped.isEmpty)
    val uncapped = Dedup.incrementalMinhashPairs(flood, b, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(uncapped.length == 70) // every pair touches the batch doc
  }
}
