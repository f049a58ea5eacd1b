package graft

import graft.streaming.StreamingWindows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingFileDedupSpec extends SparkSpec {
  import spark.implicits._

  test("file-source streaming over the events table matches the batch windows") {
    val batchEvents = graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
    val schema = batchEvents.schema
    // stage the parquet through a stream-source dir (one file = one micro-batch)
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    batchEvents.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingWindows.windowedCounts(stream, "event_type", "1 hour", "2 hours")
      .writeStream.format("memory").queryName("filewc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("filewc")
        .select(unix_timestamp($"window_start").as("h"), $"event_type", $"cnt")
        .as[(Long, String, Long)].collect().toSet
      val batch = batchEvents
        .groupBy(unix_timestamp(date_trunc("hour", $"ts")).as("h"), $"event_type")
        .agg(count(lit(1)).as("cnt"))
        .as[(Long, String, Long)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup drops repeats across micro-batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    def t(s: String) = Timestamp.valueOf(s)
    val deduped = ms.toDF().toDF("ts", "doc_id")
      .withWatermark("ts", "1 hour")
      .dropDuplicates("doc_id")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      ms.addData((t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:01:00"), 2L),
        (t("2024-01-01 10:02:00"), 1L))
      q.processAllAvailable()
      ms.addData((t("2024-01-01 10:10:00"), 2L), (t("2024-01-01 10:11:00"), 3L))
      q.processAllAvailable()
      // force watermark past all data so appended results flush
      ms.addData((t("2024-01-01 13:00:00"), 99L))
      q.processAllAvailable()
      val ids = spark.table("sdedup").select($"doc_id").as[Long].collect().toSet
      assert(Set(1L, 2L, 3L).subsetOf(ids))
      assert(spark.table("sdedup").groupBy($"doc_id").count()
        .filter($"count" > 1).count() == 0L)
    } finally q.stop()
  }

  test("streaming exact-dedup by content hash matches batch representatives") {
    implicit val ctx = spark.sqlContext
    // docs 1≡3 and 2≡5 after normalization; arrival order = doc_id order so
    // streaming first-wins equals batch min(doc_id) representatives
    val docs = Seq(
      (1L, "The quick brown fox!"), (2L, "something else entirely"),
      (3L, "the QUICK brown fox"), (4L, "a third distinct text"),
      (5L, "Something ELSE entirely...")
    )
    val ms = MemoryStream[(Timestamp, Long, String)]
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val hashed = ms.toDF().toDF("ts", "doc_id", "text")
      .withWatermark("ts", "1 hour")
      .withColumn("text_hash",
        md5(array_join(graft.functions.Exprs.tokens($"text"), " ")))
      .dropDuplicates("text_hash")
    val q = hashed.writeStream.format("memory").queryName("cdedup")
      .outputMode("append").start()
    try {
      // duplicates arrive in LATER micro-batches — state must span batches
      ms.addData(docs.take(2).map { case (id, tx) => (t(id.toInt), id, tx) }: _*)
      q.processAllAvailable()
      ms.addData(docs.drop(2).map { case (id, tx) => (t(id.toInt), id, tx) }: _*)
      q.processAllAvailable()
      ms.addData((t(59), 99L, "flush the watermark forward"))
      q.processAllAvailable()
      val streamed = spark.table("cdedup").filter($"doc_id" =!= 99L)
        .select($"doc_id").as[Long].collect().toSet
      val batchReps = graft.operators.Dedup.exact(
        docs.toDF("doc_id", "text")).select($"rep_doc_id").as[Long].collect().toSet
      assert(streamed == batchReps && batchReps == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("text operators are total on empty and degenerate inputs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.TextPipeline.termCounts(
      graft.operators.TextPipeline.tokenize(empty)).count() == 0L)
    assert(graft.operators.TextStats.quality(empty).count() == 0L)
    assert(graft.operators.Dedup.exact(empty).count() == 0L)
    val blank = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    assert(graft.operators.TextPipeline.termCounts(
      graft.operators.TextPipeline.tokenize(blank)).count() == 0L)
    assert(graft.operators.TextStats.fingerprint(blank)
      .as[(Long, Long)].collect().toMap == Map(1L -> 0L, 2L -> 0L))
  }
}
