package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord
import graft.streaming.StreamingImageDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingImageDedupSpec extends SparkSpec {
  import spark.implicits._

  /** The q177 fixture at spec scale: groups of 5 ids share a base 16×16
    * image, members 1–4 carry a 3-pixel perturbation. */
  private def record(id: Long): MediaRecord = {
    val g = id / 5; val m = id % 5
    val rgb: Int => Int = { i =>
      val p = i / 3; val c = i % 3; val x = p % 16; val y = p / 16
      val v0 = ((g * 37 + x * 13 + y * 29 + c * 71 + g * (x + 2 * y + c)) % 256).toInt
      if (m > 0 && (x + 16 * y) % 97 == m) (v0 + 128) % 256 else v0
    }
    MediaRecord(id, "bmp", Multimodal.encodeBmp(16, 16, rgb), Map.empty)
  }

  test("streamed aHash pairs across micro-batches equal the batch band join") {
    implicit val ctx = spark.sqlContext
    val records = (0L until 40L).map(record)
    val ms = MemoryStream[MediaRecord]
    val q = StreamingImageDedup.ahashCandidates(ms.toDS())
      .writeStream.format("memory").queryName("imgcand").outputMode("append").start()
    try {
      // near-dup group members must meet across micro-batch boundaries:
      // interleave arrivals so every group spans all three waves
      records.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1).foreach { case (_, wave) =>
        ms.addData(wave.map(_._1): _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("imgcand")
        .select($"docA", $"docB", $"hamming").distinct()
        .as[(Long, Long, Long)].collect().toSet
      // batch reference: the q177 plan shape on the same records
      val banded = StreamingImageDedup.bandedHashes(records.toDS())
      val batch = banded.as("a").join(banded.as("b"),
          $"a.t" === $"b.t" && $"a.bv" === $"b.bv" && $"a.id" < $"b.id")
        .select($"a.id".as("docA"), $"b.id".as("docB"),
          (expr("bit_count(a.hi ^ b.hi)") + expr("bit_count(a.lo ^ b.lo)"))
            .cast("long").as("hamming"))
        .filter($"hamming" <= 10).distinct()
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
      // the fixture's in-group pairs dominate: every emitted pair is in-group
      assert(streamed.forall { case (a, b, _) => a / 5 == b / 5 })
    } finally q.stop()
  }

  test("bucket cap stops admitting but keeps earlier members' pairs") {
    implicit val ctx = spark.sqlContext
    // 5 copies of the SAME image (ids 0,5,10,15,20 with g differing — no:
    // use one group) — ids 0..4 are one near-dup group; cap at 3 members
    val records = (0L until 5L).map(record)
    val ms = MemoryStream[MediaRecord]
    val q = StreamingImageDedup.ahashCandidates(ms.toDS(), maxBucketSize = 3)
      .writeStream.format("memory").queryName("imgcap").outputMode("append").start()
    try {
      ms.addData(records: _*)
      q.processAllAvailable()
      val got = spark.table("imgcap").select($"docA", $"docB").distinct()
        .as[(Long, Long)].collect().toSet
      // with ≤3 members per bucket, pairs among the first three admitted
      // members of each band bucket survive; the full 10-pair clique does not
      assert(got.nonEmpty && got.size < 10, s"cap should truncate: $got")
    } finally q.stop()
  }
}
