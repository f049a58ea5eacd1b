package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media travels as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs per-partition in batches so a real codec
  * library would amortize model/codec init across a partition (the Scala
  * analogue of `mapInPandas` batch shape).
  *
  * The decode kernel itself is a STUB — this container ships no image/audio
  * codecs — replaced by a deterministic byte-statistics fake with the same
  * signature, so the Spark-side schema, partitioning and batch plumbing are
  * real and testable end-to-end.
  */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, kind: String, content: Array[Byte],
                         meta: Map[String, String])

  /** Extracted features: fixed-width embedding + decoded dimensions. */
  case class MediaFeatures(media_id: Long, kind: String, width: Int, height: Int,
                           n_bytes: Long, features: Array[Float])

  /** Ingest a directory of media files as binary columns (Spark's binaryFile
    * source: path, modificationTime, length, content). */
  def binaryFiles(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(col("path"), col("length"), col("content"))

  /** STUB decoder — stands in for e.g. javax.imageio / ffmpeg. Deterministic:
    * derives pseudo-dimensions and a 16-dim byte-histogram feature from the
    * payload, so tests can assert exact values. A production deployment
    * swaps only this function. */
  private[graft] def decodeStub(kind: String, content: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = content.length
    val width = 1 + math.abs(if (n == 0) 0 else content(0).toInt) % 64
    val height = 1 + math.abs(if (n < 2) 0 else content(1).toInt) % 64
    val hist = new Array[Float](16)
    var i = 0
    while (i < n) { hist((content(i) & 0xff) % 16) += 1.0f; i += 1 }
    if (n > 0) { var j = 0; while (j < 16) { hist(j) /= n.toFloat; j += 1 } }
    (width, height, hist)
  }

  /** Batch feature extraction: per-partition iteration (codec init once per
    * partition, not per record), typed Dataset in/out. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition "codec" initialization would go here
      it.map { r =>
        val (w, h, feats) = decodeStub(r.kind, r.content)
        MediaFeatures(r.media_id, r.kind, w, h, r.content.length.toLong, feats)
      }
    }
  }

  /** Deterministic frame sampling for video-kind records: every `stride`-th
    * byte window becomes a "frame" payload (stub for real frame extraction,
    * preserving the 1-row → N-rows generator shape). */
  def sampleFrames(records: Dataset[MediaRecord], stride: Int): DataFrame = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      val n = math.max(r.content.length / math.max(stride, 1), 0)
      (0 until n).map { f =>
        val off = f * stride
        (r.media_id, f, r.content.slice(off, math.min(off + stride, r.content.length)))
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }
}
