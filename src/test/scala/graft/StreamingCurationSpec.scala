package graft

import graft.streaming.StreamingCuration
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  test("streaming curation across micro-batches equals the batch chain") {
    implicit val ctx = spark.sqlContext
    // markup-wrapped docs, a PII doc, a too-short doc, and duplicates whose
    // copies arrive in DIFFERENT waves (so dedup state must span batches)
    val docs = Seq(
      (1L, "<p>alpha beta gamma delta epsilon</p>"),
      (2L, "call 5551234567 about alpha beta gamma delta epsilon zeta"),
      (3L, "too short"),
      (4L, "<html><body>alpha beta gamma delta epsilon</body></html>"), // dup of 1 after strip
      (5L, "plain words one two three four five"),
      (6L, "plain words one two three four five")) // dup of 5
    val ms = MemoryStream[(Long, String)]
    val q = StreamingCuration.curate(ms.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curated").outputMode("append").start()
    try {
      docs.grouped(2).foreach { wave =>
        ms.addData(wave: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("curated")
        .select($"content_hash", $"clean", $"n_tok").as[(Long, String, Long)]
        .collect().toSet
      val batch = StreamingCuration.curate(docs.toDF("doc_id", "text"))
        .select($"content_hash", $"clean", $"n_tok").as[(Long, String, Long)]
        .collect().toSet
      // parity on surviving CONTENT (which duplicate survives is
      // arrival-order-dependent, documented on the operator)
      assert(streamed == batch)
      // exactly three distinct cleaned documents survive: 1≡4 merged,
      // 5≡6 merged, 2 redacted; 3 gated out by length
      assert(streamed.size == 3)
      assert(streamed.exists(_._2.contains("<PHONE>")))
      assert(streamed.forall(r => !r._2.contains("<p>") && !r._2.contains("<html>")))
    } finally q.stop()
  }

  test("watermarked dedup suppresses duplicates within the horizon") {
    implicit val ctx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingCuration.curateWithWatermark(
        ms.toDF().toDF("doc_id", "ts", "text"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("curatedwm").outputMode("append").start()
    try {
      // same cleaned content arriving three times inside the horizon: only
      // the first emission survives; a distinct doc passes through
      ms.addData((1L, ts(0), "alpha beta gamma delta epsilon"))
      q.processAllAvailable()
      ms.addData((2L, ts(30), "<p>alpha beta gamma delta epsilon</p>"),
        (3L, ts(60), "plain words one two three four five"))
      q.processAllAvailable()
      ms.addData((4L, ts(90), "alpha beta gamma delta epsilon"))
      q.processAllAvailable()
      val out = spark.table("curatedwm").select($"doc_id").as[Long].collect().toSet
      assert(out == Set(1L, 3L))
    } finally q.stop()
  }
}
