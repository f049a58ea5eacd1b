package graft

import graft.streaming.StreamingBlocklist
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingBlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val phrases = Seq("table table", "fast key", "a a")

  private val docs = Seq(
    (1L, "the Table table key scan"),        // 'table table' once (case-folded)
    (2L, "fast key fast key fast key"),      // 'fast key' three times
    (3L, "spark a a a stream"),              // 'a a' twice, overlapping
    (4L, "nothing listed here"))             // never emits

  test("streamed blocklist flags equal the batch twin across waves") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = StreamingBlocklist.flag(ms.toDF().toDF("doc_id", "text"), phrases)
      .writeStream.format("memory").queryName("blocklist").outputMode("append")
      .start()
    try {
      docs.grouped(2).foreach { wave =>
        ms.addData(wave: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("blocklist")
        .as[(Long, String, Long)].collect().toSet
      val batch = StreamingBlocklist.flag(docs.toDF("doc_id", "text"), phrases)
        .as[(Long, String, Long)].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set(
        (1L, "table table", 1L),
        (2L, "fast key", 3L),
        (3L, "a a", 2L)))
    } finally q.stop()
  }

  test("the streaming plan is stateless: no aggregation or join state") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = StreamingBlocklist.flag(ms.toDF().toDF("doc_id", "text"), phrases)
      .writeStream.format("memory").queryName("blocklist_plan").outputMode("append")
      .start()
    try {
      ms.addData((1L, "table table here"))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}
