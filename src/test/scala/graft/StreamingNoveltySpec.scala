package graft

import graft.streaming.StreamingNovelty
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch parity and redelivery contracts of [[graft.streaming.StreamingNovelty]]
  * — the ingest twin of q228's first-seen novelty card. */
class StreamingNoveltySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    .select($"doc_id", $"text")

  test("doc_id-ordered waves reproduce the batch card across micro-batches") {
    implicit val ctx = spark.sqlContext
    val docs = corpus.as[(Long, String)].collect().sortBy(_._1)
    val ms = MemoryStream[(Long, String)]
    val q = StreamingNovelty.firstSeenAttribution(ms.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("novelty").outputMode("append").start()
    try {
      docs.grouped((docs.length + 2) / 3).foreach { wave =>
        ms.addData(wave: _*)
        q.processAllAvailable()
      }
      val attr = spark.table("novelty")
      // per-gram: the streamed first holder is the batch min doc_id
      val streamedFirst = attr.filter($"first")
        .select($"gram", $"docId").as[(String, Long)].collect().toSet
      val batchFirst = StreamingNovelty.gramRows(corpus).toDF()
        .groupBy($"gram").agg(min($"docId").as("docId"))
        .as[(String, Long)].collect().toSet
      assert(streamedFirst == batchFirst && streamedFirst.nonEmpty)
      // per-doc: the stateless rollup of the attribution rows equals the
      // batch q228 card on the same corpus
      val streamedCard = StreamingNovelty.noveltyCard(attr)
        .as[(Long, Long, Long, Long)].collect().toSet
      val batchCard = SparkEntry.queries("q228_first_seen_novelty")(
          spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamedCard == batchCard && streamedCard.nonEmpty)
    } finally q.stop()
  }

  test("redelivery re-emits only first=false rows — attribution is stable") {
    implicit val ctx = spark.sqlContext
    val docs = corpus.as[(Long, String)].collect().sortBy(_._1)
    val (w1, w2) = docs.splitAt(docs.length / 2)
    val ms = MemoryStream[(Long, String)]
    val q = StreamingNovelty.firstSeenAttribution(ms.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("novelty_redeliver")
      .outputMode("append").start()
    try {
      ms.addData(w1: _*); q.processAllAvailable()
      val firstBefore = spark.table("novelty_redeliver").filter($"first")
        .select($"gram", $"docId").as[(String, Long)].collect().toSet
      ms.addData(w1: _*); q.processAllAvailable() // redeliver wave 1
      ms.addData(w2: _*); q.processAllAvailable()
      val attr = spark.table("novelty_redeliver")
      val firstAfter = attr.filter($"first")
        .select($"gram", $"docId").as[(String, Long)].collect().toSet
      // wave-1 grams keep their original first attribution (no new TRUE rows
      // for already-seen grams), and the full-run TRUE set still equals the
      // batch min-doc census
      assert(firstBefore.subsetOf(firstAfter))
      val batchFirst = StreamingNovelty.gramRows(corpus).toDF()
        .groupBy($"gram").agg(min($"docId").as("docId"))
        .as[(String, Long)].collect().toSet
      assert(firstAfter == batchFirst)
      // the card over the REDELIVERED attribution table equals the batch
      // q228 card — redelivered first=false rows must not inflate n_grams
      // or deflate novelty_ppm (ADVICE r12: the (doc, gram) collapse)
      val streamedCard = StreamingNovelty.noveltyCard(attr)
        .as[(Long, Long, Long, Long)].collect().toSet
      val batchCard = SparkEntry.queries("q228_first_seen_novelty")(
          spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamedCard == batchCard && streamedCard.nonEmpty)
    } finally q.stop()
  }
}
