package graft

import java.sql.Timestamp

import graft.streaming.StreamingJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join vs its batch twin: inner matches must be
  * identical, and the left-outer variant must flush never-converted
  * impressions (null click) once the watermark passes their deadline. */
class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // impressions: u1 at 10:00 (converts at 10:03), u2 at 10:00 (converts
  // LATE at 10:20 — outside the 10-minute window), u3 at 10:05 (never
  // converts). One cross-key decoy: u1 click at 10:03 must not match u2.
  private val impRows = Seq(
    (t("2024-01-01 10:00:00"), "u1"),
    (t("2024-01-01 10:00:00"), "u2"),
    (t("2024-01-01 10:05:00"), "u3"))
  private val clkRows = Seq(
    (t("2024-01-01 10:03:00"), "u1"),
    (t("2024-01-01 10:20:00"), "u2"))

  test("inner attribution join equals the batch interval join") {
    implicit val ctx = spark.sqlContext
    val imp = MemoryStream[(Timestamp, String)]
    val clk = MemoryStream[(Timestamp, String)]
    imp.addData(impRows: _*)
    clk.addData(clkRows: _*)
    val q = StreamingJoins.attributionJoin(
      imp.toDF().toDF("ts", "user"), clk.toDF().toDF("ts", "user"),
      "user", "10 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("attr_inner").start()
    try {
      q.processAllAvailable()
      val got = spark.table("attr_inner")
        .select($"user", $"imp_ts".cast("string"), $"clk_ts".cast("string"))
        .as[(String, String, String)].collect().toSet
      val batch = StreamingJoins.attributionJoinBatch(
        impRows.toDF("ts", "user"), clkRows.toDF("ts", "user"), "user", "10 minutes")
        .select($"user", $"imp_ts".cast("string"), $"clk_ts".cast("string"))
        .as[(String, String, String)].collect().toSet
      assert(got == batch)
      assert(got == Set(("u1", "2024-01-01 10:00:00", "2024-01-01 10:03:00")))
    } finally q.stop()
  }

  test("left-outer join flushes never-converted impressions past the watermark") {
    implicit val ctx = spark.sqlContext
    val imp = MemoryStream[(Timestamp, String)]
    val clk = MemoryStream[(Timestamp, String)]
    imp.addData(impRows: _*)
    clk.addData(clkRows: _*)
    val q = StreamingJoins.attributionJoin(
      imp.toDF().toDF("ts", "user"), clk.toDF().toDF("ts", "user"),
      "user", "10 minutes", watermark = "0 seconds", joinType = "leftOuter")
      .writeStream.format("memory").queryName("attr_outer").start()
    try {
      q.processAllAvailable()
      // advance BOTH watermarks far past every deadline so unmatched
      // impressions are flushed with a null click side
      imp.addData((t("2024-01-01 12:00:00"), "zz"))
      clk.addData((t("2024-01-01 12:00:00"), "zz"))
      q.processAllAvailable()
      val got = spark.table("attr_outer")
        .filter($"user" =!= "zz")
        .select($"user", $"imp_ts".cast("string"), $"clk_ts".cast("string"))
        .as[(String, String, Option[String])].collect().toSet
      val batch = StreamingJoins.attributionJoinBatch(
        impRows.toDF("ts", "user"), clkRows.toDF("ts", "user"),
        "user", "10 minutes", joinType = "leftOuter")
        .select($"user", $"imp_ts".cast("string"), $"clk_ts".cast("string"))
        .as[(String, String, Option[String])].collect().toSet
      assert(got == batch)
      // u2's in-window click never arrived (10:20 is outside) and u3 never
      // clicked: both must surface as definitive non-conversions
      assert(got.contains(("u2", "2024-01-01 10:00:00", None)))
      assert(got.contains(("u3", "2024-01-01 10:05:00", None)))
    } finally q.stop()
  }
}
