package graft

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{FunnelEvent, FunnelStages}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Batch-parity for the streaming funnel: per-user stage timestamps after
  * the watermark passes must equal the q106 batch fold on the same events,
  * including out-of-order arrival WITHIN the watermark horizon. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
  private val stages = Seq("view", "click", "purchase")

  /** Reference: the q106 semantics folded in memory. */
  private def batchFold(evs: Seq[FunnelEvent]): Map[Long, (Long, Long, Long)] =
    evs.groupBy(_.user_id).map { case (u, es) =>
      def us(x: FunnelEvent) = x.ts.getTime * 1000L
      val views = es.filter(_.event_type == "view").map(us)
      val t1 = if (views.isEmpty) -1L else views.min
      val clicks = es.filter(_.event_type == "click").map(us).filter(c => t1 != -1L && c > t1)
      val t2 = if (clicks.isEmpty) -1L else clicks.min
      val buys = es.filter(_.event_type == "purchase").map(us).filter(p => t2 != -1L && p > t2)
      val t3 = if (buys.isEmpty) -1L else buys.min
      u -> ((t1, t2, t3))
    }

  private def run(waves: Seq[Seq[FunnelEvent]]): Map[Long, (Long, Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[FunnelEvent]
    val out = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    val q = StreamingFunnel.funnelStages(ms.toDS(), stages, watermark = "5 minutes")
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[FunnelStages], _: Long) =>
        out.synchronized {
          df.collect().foreach(r => out(r.user_id) = ((r.t1, r.t2, r.t3)))
        }
        ()
      }.start()
    try {
      waves.foreach { w => ms.addData(w); q.processAllAvailable() }
      // sentinel far in the future: watermark passes every real event
      ms.addData(Seq(FunnelEvent(999L, "view", t(59))))
      q.processAllAvailable()
      ms.addData(Seq(FunnelEvent(998L, "view", t(59))))
      q.processAllAvailable()
    } finally q.stop()
    out.toMap.filter(_._1 < 900L)
  }

  test("in-order funnel equals the batch fold") {
    val evs = Seq(
      FunnelEvent(1L, "view", t(1)), FunnelEvent(1L, "click", t(2)), FunnelEvent(1L, "purchase", t(3)),
      FunnelEvent(2L, "view", t(1)), FunnelEvent(2L, "purchase", t(2)), // skipped click: no t3
      FunnelEvent(3L, "click", t(1)), FunnelEvent(3L, "view", t(2))) // click BEFORE view: no t2
    assert(run(Seq(evs)) == batchFold(evs))
  }

  test("out-of-order arrival within the horizon folds in event-time order") {
    // user 4's click ARRIVES before its view but is LATER in event time —
    // the fold must still produce view→click; user 5's earlier-ts view
    // arrives second and must win t1
    val w1 = Seq(FunnelEvent(4L, "click", t(3)), FunnelEvent(5L, "view", t(4)))
    val w2 = Seq(FunnelEvent(4L, "view", t(2)), FunnelEvent(5L, "view", t(1)),
      FunnelEvent(5L, "click", t(2)))
    val all = w1 ++ w2
    assert(run(Seq(w1, w2)) == batchFold(all))
    // sanity on the interesting rows
    val got = run(Seq(w1, w2))
    assert(got(4L)._1 != -1L && got(4L)._2 != -1L, s"user 4 must reach click: $got")
    assert(got(5L)._1 == t(1).getTime * 1000L, s"user 5 t1 must be the min view: $got")
  }

  test("file-source replay of the real events table matches the batch q106 fold") {
    import org.apache.spark.sql.functions._
    // the q106 catalog shape on REAL data: replay the sf0.001 events table
    // through a file stream in three user-sliced waves — each later wave
    // carries events EARLIER in event time than ones already processed
    // (late arrivals within the horizon) — and assert the FINAL per-user
    // stage rows equal the batch fold. Timestamps have live microsecond
    // fractions, so this also pins the full-precision event-time keys
    // (ADVICE r7: getTime*1000 truncation diverged from batch here).
    val ev = graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", $"event_type", $"ts")
    val dir = java.nio.file.Files.createTempDirectory("funnelstream").toString
    // wave files in a deliberate order; mtime gaps make FileStreamSource
    // pick them up one micro-batch at a time (maxFilesPerTrigger = 1)
    val waves = Seq(0, 1, 2).map(w => ev.filter(pmod($"user_id", lit(3)) === w))
    val maxTs = ev.agg(max($"ts")).head().getTimestamp(0)
    val sentinel = Seq(StreamingFunnel.FunnelEvent(999999L, "view",
      new Timestamp(maxTs.getTime + 100L * 24 * 3600 * 1000))).toDF()
      .select($"user_id", $"event_type", $"ts")
    (waves :+ sentinel).zipWithIndex.foreach { case (w, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"wave$i").toString
      w.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, f"wave$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .as[FunnelEvent]
    // watermark wider than the table's 30-day span: no wave-2 event is
    // horizon-dropped; the sentinel then pushes the horizon past max ts so
    // every buffered prefix folds to its final value
    val out = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    val q = StreamingFunnel.funnelStages(stream, stages, watermark = "40 days")
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[FunnelStages], _: Long) =>
        out.synchronized {
          df.collect().foreach(r => out(r.user_id) = ((r.t1, r.t2, r.t3)))
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // batch reference: q106's strict-gate per-user stage mins, in micros
    val t1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val t2 = ev.filter($"event_type" === "click").join(t1, "user_id")
      .filter($"ts" > $"t1").groupBy($"user_id").agg(min($"ts").as("t2"))
    val t3 = ev.filter($"event_type" === "purchase").join(t2, "user_id")
      .filter($"ts" > $"t2").groupBy($"user_id").agg(min($"ts").as("t3"))
    val batch = t1.join(t2, Seq("user_id"), "left").join(t3, Seq("user_id"), "left")
      .select($"user_id", unix_micros($"t1").as("t1"),
        coalesce(unix_micros($"t2"), lit(-1L)).as("t2"),
        coalesce(unix_micros($"t3"), lit(-1L)).as("t3"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val streamed = out.toMap.filter { case (u, s) => u != 999999L && s._1 != -1L }
    assert(batch.nonEmpty && streamed == batch,
      s"stream/batch divergence: ${streamed.toSet.diff(batch.toSet).take(5)} / " +
        s"${batch.toSet.diff(streamed.toSet).take(5)}")
  }

  test("same-timestamp stage events do not leak through strict gates") {
    // view and click at the SAME instant: the click must NOT count (q106
    // uses strict >), in any arrival order
    val evs = Seq(FunnelEvent(6L, "click", t(2)), FunnelEvent(6L, "view", t(2)),
      FunnelEvent(6L, "purchase", t(3)))
    val got = run(Seq(evs))
    assert(got == batchFold(evs))
    assert(got(6L)._2 == -1L && got(6L)._3 == -1L, s"strict gate leaked: $got")
  }
}
