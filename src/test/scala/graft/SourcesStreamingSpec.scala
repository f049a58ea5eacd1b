package graft

import graft.sources.CorpusSource
import graft.streaming.StreamingWindows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class SourcesStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def mkCorpus(): String = {
    val root = Files.createTempDirectory("corpus").toFile
    def write(split: String, label: String, doc: String, text: String): Unit = {
      val d = new java.io.File(root, s"$split/$label")
      d.mkdirs()
      Files.write(new java.io.File(d, doc).toPath, text.getBytes)
    }
    write("train", "sci.space", "51220", "rocket orbit\nlaunch star")
    write("train", "rec.autos", "10211", "engine car wheel")
    write("test", "sci.space", "51299", "rocket star")
    root.getAbsolutePath
  }

  test("corpus source: dir-per-class scan exposes split/label/doc_id columns") {
    val root = mkCorpus()
    val docs = CorpusSource.documents(spark, root)
      .as[(String, String, String, String)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(docs.size == 3)
    assert(docs(("train", "sci.space", "51220")) == "rocket orbit\nlaunch star")
    assert(docs(("test", "sci.space", "51299")) == "rocket star")
    val lines = CorpusSource.lines(spark, root)
    assert(lines.count() == 4L) // 2-line doc + 1 + 1
  }

  test("partitioned sink (S5 analogue): partitionBy key routes files per label") {
    val root = mkCorpus()
    val out = Files.createTempDirectory("sink").toFile.getAbsolutePath
    CorpusSource.documents(spark, root)
      .write.mode("overwrite").partitionBy("split", "label").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 3L)
    assert(new java.io.File(s"$out/split=train/label=sci.space").exists())
    assert(back.filter(col("split") === "test").count() == 1L)
  }

  test("partition pruning: a filter on the layout key scans only matching dirs") {
    val root = mkCorpus()
    val out = Files.createTempDirectory("pruned").toFile.getAbsolutePath
    CorpusSource.documents(spark, root)
      .write.mode("overwrite").partitionBy("split").parquet(out)
    val q = spark.read.parquet(out).filter(col("split") === "test")
    val scan = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    // the split predicate must be a PartitionFilter (directory pruning at
    // plan time — the 100 TB point of a partitionBy layout), not a data
    // filter evaluated after reading every file
    assert(scan.partitionFilters.exists(_.toString.contains("split")), scan.toString)
    q.collect()
    // and the scan must actually have read only the matching partition's files
    assert(scan.metrics("numFiles").value == 1L, scan.metrics("numFiles").value.toString)
  }

  test("streaming windowed counts equal the batch result (same shape)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    def t(s: String) = Timestamp.valueOf(s)
    ms.addData(
      (t("2024-01-01 10:05:00"), "click"), (t("2024-01-01 10:20:00"), "click"),
      (t("2024-01-01 10:40:00"), "view"), (t("2024-01-01 11:10:00"), "click"))
    val q = StreamingWindows.windowedCounts(
      ms.toDF().toDF("ts", "event_type"), "event_type", "1 hour")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("wc")
        .select(col("window_start").cast("string"), col("event_type"), col("cnt"))
        .as[(String, String, Long)].collect().toSet
      assert(got == Set(
        ("2024-01-01 10:00:00", "click", 2L),
        ("2024-01-01 10:00:00", "view", 1L),
        ("2024-01-01 11:00:00", "click", 1L)))
    } finally q.stop()
  }
}
