package graft

import graft.operators.Dedup
import graft.streaming.StreamingWinnowing
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingWinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4
  private val W = 4

  // two protected passages, both ≥ w+k-1 = 7 tokens (detection guaranteed)
  private val lic1 = "chapter one of the licensed book begins with these exact words"
  private val lic2 = "the secret evaluation answer key must never appear in training"

  private val refDocs = Seq(
    (100L, s"front matter $lic1 and the rest of the chapter"),
    (101L, s"$lic2 stored in the reference vault"),
    (102L, s"a second edition where $lic1 also appears verbatim"))

  private val streamDocs = Seq(
    (1L, s"a crawled page quoting $lic1 wholesale"), // hits 100 AND 102
    (2L, "a clean document with entirely original content and no shared runs"),
    (3L, s"forum post leaking $lic2 in full"), // hits 101
    (4L, "tiny doc")) // under k tokens: no grams, no fingerprints

  test("streamed winnowing overlap equals the batch pair operator across waves") {
    implicit val ctx = spark.sqlContext
    val index = StreamingWinnowing.referenceIndex(
      refDocs.toDF("doc_id", "text"), K, W)
    // the shared lic1 fingerprints attribute to BOTH reference editions
    assert(index.values.exists(_ == Seq(100L, 102L)))

    val ms = MemoryStream[(Long, String)]
    val q = StreamingWinnowing.flag(ms.toDF().toDF("doc_id", "text"), index,
        K, W, minShared = 1L)
      .writeStream.format("memory").queryName("winnow").outputMode("append")
      .start()
    try {
      streamDocs.grouped(2).foreach { wave =>
        ms.addData(wave: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("winnow")
        .as[(Long, Long, Long)].collect().toSet
      // batch twin: the q211 pair operator over ref ∪ stream, restricted to
      // (stream doc, reference doc) pairs — counts must agree exactly
      val batch = Dedup.winnowedOverlapPairs(
          (refDocs ++ streamDocs).toDF("doc_id", "text"), K, W, minShared = 1L)
        .filter(col("doc_a") < 100 && col("doc_b") >= 100)
        .select(col("doc_a"), col("doc_b"), col("n_shared_fp"))
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed.exists(r => r._1 == 1L && r._2 == 100L))
      assert(streamed.exists(r => r._1 == 1L && r._2 == 102L))
      assert(streamed.exists(r => r._1 == 3L && r._2 == 101L))
      assert(!streamed.exists(r => r._1 == 2L || r._1 == 4L))

      // redelivery: verdicts are per-row deterministic — a replayed doc
      // emits the identical rows (dedup is the sink's concern, not state)
      val before = spark.table("winnow").count()
      ms.addData(streamDocs.head)
      q.processAllAvailable()
      val again = spark.table("winnow")
        .filter(col("doc_id") === 1L).as[(Long, Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(spark.table("winnow").count() == before + 2)
      assert(again.values.forall(_ == 2)) // each pair row exactly twice
    } finally q.stop()
  }

  test("the streaming winnowing plan is stateless") {
    implicit val ctx = spark.sqlContext
    val index = StreamingWinnowing.referenceIndex(
      refDocs.toDF("doc_id", "text"), K, W)
    val ms = MemoryStream[(Long, String)]
    val q = StreamingWinnowing.flag(ms.toDF().toDF("doc_id", "text"), index,
        K, W, minShared = 1L)
      .writeStream.format("memory").queryName("winnow_plan").outputMode("append")
      .start()
    try {
      ms.addData((1L, s"carrier of $lic1 here"))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}
