package graft

import graft.operators.CountMin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The Count–Min streaming twin needs NO new operator: the sketch is a
  * (j, cell)-keyed grouped SUM whose state is bounded at d·w rows by
  * construction, so [[CountMin.build]] runs unchanged as a streaming
  * aggregation in complete mode — a micro-batch boundary is just a fold
  * boundary for a sum. This spec pins batch ≡ stream on the FINAL matrix
  * across multi-wave arrival. */
class StreamingCountMinSpec extends SparkSpec {
  import spark.implicits._

  test("streaming sketch equals the batch sketch on the same rows") {
    implicit val ctx = spark.sqlContext
    val waves = Seq(
      Seq(("alpha", 3L), ("beta", 1L), ("gamma", 2L)),
      Seq(("alpha", 2L), ("delta", 7L)),
      Seq(("beta", 4L), ("alpha", 1L)))
    val ms = MemoryStream[(String, Long)]
    val q = CountMin.build(ms.toDF().toDF("key", "cnt"), depth = 4, width = 64)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cm_stream")
      .start()
    val got = try {
      waves.foreach { w => ms.addData(w); q.processAllAvailable() }
      spark.table("cm_stream")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    } finally q.stop()
    val want = CountMin.build(waves.flatten.toDF("key", "cnt"), depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want, s"stream $got vs batch $want")
    // and the streamed matrix serves estimates identically
    val est = CountMin.estimate(Seq("alpha", "delta").toDF("key"),
        spark.table("cm_stream"), depth = 4, width = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(est == Map("alpha" -> 6L, "delta" -> 7L))
  }

  test("streaming HLL registers equal the batch registers (grouped max state)") {
    // same argument as Count-Min: Hll.registers is a grouped integer MAX
    // with state bounded at m rows per group — it runs unchanged as a
    // streaming aggregation, and max-of-maxes makes batch boundaries
    // invisible
    implicit val ctx = spark.sqlContext
    val waves = Seq(
      (1 to 400).map(i => ("g", s"k$i")),
      (200 to 700).map(i => ("g", s"k$i")),
      (650 to 900).map(i => ("g", s"k$i")))
    val ms = MemoryStream[(String, String)]
    val q = graft.operators.Hll.registers(ms.toDF().toDF("g", "key"), Seq("g"), "key")
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_stream")
      .start()
    val got = try {
      waves.foreach { w => ms.addData(w); q.processAllAvailable() }
      spark.table("hll_stream")
        .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    } finally q.stop()
    val want = graft.operators.Hll.registers(
        waves.flatten.toDF("g", "key"), Seq("g"), "key")
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(got == want)
  }
}
