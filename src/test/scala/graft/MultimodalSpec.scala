package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def records = Seq(
    MediaRecord(1L, "image", Array[Byte](3, 5, 16, 16, 16), Map("fmt" -> "png")),
    MediaRecord(2L, "audio", Array[Byte](), Map("fmt" -> "wav"))
  ).toDS()

  test("feature extraction preserves ids and produces fixed-width features") {
    val out = Multimodal.extractFeatures(records).collect().map(f => f.media_id -> f).toMap
    assert(out.keySet == Set(1L, 2L))
    val f1 = out(1L)
    assert(f1.width == 4 && f1.height == 6) // 1 + 3%64, 1 + 5%64 (stub semantics)
    assert(f1.n_bytes == 5L && f1.features.length == 16)
    // histogram: bytes 3,5,16,16,16 → bucket3:1/5, bucket5:1/5, bucket0:3/5
    assert(f1.features(0) == 0.6f && f1.features(3) == 0.2f && f1.features(5) == 0.2f)
    assert(out(2L).features.forall(_ == 0.0f))
  }

  test("binaryFiles ingests payloads as binary columns with glob filtering") {
    val dir = java.nio.file.Files.createTempDirectory("media").toFile
    java.nio.file.Files.write(new java.io.File(dir, "a.png").toPath, Array[Byte](1, 2, 3))
    java.nio.file.Files.write(new java.io.File(dir, "b.txt").toPath, Array[Byte](9))
    val df = Multimodal.binaryFiles(spark, dir.getAbsolutePath, "*.png")
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("length") == 3L)
    assert(rows.head.getAs[Array[Byte]]("content").toSeq == Seq[Byte](1, 2, 3))
  }

  test("frame sampling is a 1-row → N-rows generator over the payload") {
    val frames = Multimodal.sampleFrames(records, stride = 2)
      .as[(Long, Int, Array[Byte])].collect()
    val byDoc = frames.groupBy(_._1)
    assert(byDoc(1L).length == 2) // 5 bytes / stride 2
    assert(byDoc(1L).sortBy(_._2).head._3.toSeq == Seq[Byte](3, 5))
    assert(!byDoc.contains(2L))
  }
}
