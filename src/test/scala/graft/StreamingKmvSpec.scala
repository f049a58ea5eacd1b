package graft

import graft.operators.Kmv
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The KMV streaming twin needs NO new operator: the k-min sample is a
  * mergeable bounded-heap aggregate, so [[Kmv.kminSample]] runs unchanged
  * as a streaming complete-mode query — each micro-batch re-mins the heap
  * state, which is exactly how theta sketches merge across shards. This
  * spec pins batch ≡ stream on the FINAL sample across multi-wave arrival
  * (waves carry disjoint hashes — the operator's documented distinct-h
  * input contract, met upstream by id-sharded sources or dropDuplicates).
  */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  test("streaming k-min sample equals the batch sketch on the same hashes") {
    implicit val ctx = spark.sqlContext
    // three waves of disjoint 48-bit-ish hash values, interleaved ranges so
    // every wave displaces part of the current heap
    val waves = Seq(
      Seq(500L, 103L, 999L, 42L, 777L),
      Seq(7L, 600L, 55L, 888L),
      Seq(3L, 501L, 41L, 1000L))
    val ms = MemoryStream[Long]
    val q = Kmv.kminSample(ms.toDF().toDF("h"), k = 6)
      .writeStream.outputMode("complete")
      .format("memory").queryName("kmv_stream")
      .start()
    val got = try {
      waves.foreach { w => ms.addData(w); q.processAllAvailable() }
      spark.table("kmv_stream").as[Long].collect().sorted.toSeq
    } finally q.stop()
    val want = Kmv.kminSample(waves.flatten.toDF("h"), k = 6)
      .as[Long].collect().sorted.toSeq
    assert(got == want, s"stream $got vs batch $want")
    assert(got == Seq(3L, 7L, 41L, 42L, 55L, 103L))
  }
}
