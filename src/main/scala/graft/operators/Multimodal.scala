package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media travels as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs per-partition in batches so a real codec
  * library would amortize model/codec init across a partition (the Scala
  * analogue of `mapInPandas` batch shape).
  *
  * Decode is REAL for the library-free raster formats — PPM (P6) and
  * uncompressed 24-bit BMP are header + raw pixels, parsed here directly
  * (dimensions + per-channel means + luminance histogram, spec'd against
  * hand-built images) — and a STUB only for codec-bound formats (JPEG, MP3,
  * H.264…), since this container ships no codec libraries. Malformed or
  * unrecognized payloads fall back to the deterministic byte-statistics
  * stub rather than failing the partition — the junk-file-guard posture
  * (SURVEY §2 P7): one corrupt file must never kill a 100 TB scan.
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

  /** STUB decoder — stands in for e.g. javax.imageio / ffmpeg on codec-bound
    * formats. Deterministic: derives pseudo-dimensions and a 16-dim
    * byte-histogram feature from the payload, so tests can assert exact
    * values. A production deployment swaps only this function. */
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

  /** 16-dim feature vector from raw RGB pixels: [meanR, meanG, meanB,
    * 13-bin luminance histogram], all normalized to [0,1]. `rgb(i)` must
    * yield interleaved R,G,B bytes for `w*h` pixels. */
  private def pixelFeatures(w: Int, h: Int, rgb: Int => Int): Array[Float] = {
    val feats = new Array[Float](16)
    val n = w * h
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < n) {
      val r = rgb(3 * i); val g = rgb(3 * i + 1); val b = rgb(3 * i + 2)
      sr += r; sg += g; sb += b
      // integer Rec.601 luma; 13 bins over 0..255
      val y = (299 * r + 587 * g + 114 * b) / 1000
      feats(3 + math.min(y * 13 / 256, 12)) += 1.0f
      i += 1
    }
    feats(0) = sr.toFloat / (255.0f * n); feats(1) = sg.toFloat / (255.0f * n)
    feats(2) = sb.toFloat / (255.0f * n)
    var j = 3; while (j < 16) { feats(j) /= n.toFloat; j += 1 }
    feats
  }

  /** Real PPM (P6, 8-bit maxval) parse: ASCII header `P6 <w> <h> <maxval>`
    * with `#` comments, then raw interleaved RGB. None on any malformation. */
  private[graft] def decodePpm(content: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (content.length < 2 || content(0) != 'P' || content(1) != '6') return None
    var pos = 2
    // header tokens are whitespace-separated; '#' starts a comment to EOL
    def nextInt(): Option[Int] = {
      while (pos < content.length &&
             (content(pos).toChar.isWhitespace || content(pos) == '#')) {
        if (content(pos) == '#')
          while (pos < content.length && content(pos) != '\n') pos += 1
        else pos += 1
      }
      val start = pos
      while (pos < content.length && content(pos).toChar.isDigit) pos += 1
      if (pos == start) None else Some(new String(content, start, pos - start).toInt)
    }
    for {
      w <- nextInt(); h <- nextInt(); maxval <- nextInt()
      if w > 0 && h > 0 && maxval == 255 && pos + 1 + 3L * w * h <= content.length
    } yield {
      val base = pos + 1 // exactly one whitespace byte after maxval per spec
      (w, h, pixelFeatures(w, h, i => content(base + i) & 0xff))
    }
  }

  /** Real BMP parse: uncompressed 24-bit BITMAPINFOHEADER only (the
    * library-free common case). Rows are 4-byte padded, stored bottom-up
    * (negative height = top-down). None on any other variant. */
  private[graft] def decodeBmp(content: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    def u16(o: Int) = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
    def i32(o: Int) = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8) |
      ((content(o + 2) & 0xff) << 16) | ((content(o + 3) & 0xff) << 24)
    if (content.length < 54 || content(0) != 'B' || content(1) != 'M') return None
    val dataOff = i32(10); val w = i32(18); val hRaw = i32(22)
    val h = math.abs(hRaw); val topDown = hRaw < 0
    if (w <= 0 || h == 0 || u16(28) != 24 || i32(30) != 0) return None
    val rowBytes = (3 * w + 3) / 4 * 4
    if (dataOff < 54 || dataOff.toLong + rowBytes.toLong * h > content.length) return None
    Some((w, h, pixelFeatures(w, h, { i =>
      val px = i / 3; val ch = i % 3 // BGR on disk → map R/G/B request to 2/1/0
      val row = px / w; val diskRow = if (topDown) row else h - 1 - row
      content(dataOff + diskRow * rowBytes + (px % w) * 3 + (2 - ch)) & 0xff
    })))
  }

  /** Decode dispatch: real parser when the payload self-identifies as a
    * library-free format, stub otherwise (including malformed payloads —
    * fall back, never throw: one corrupt file must not kill the scan). */
  private[graft] def decode(kind: String, content: Array[Byte]): (Int, Int, Array[Float]) =
    decodePpm(content).orElse(decodeBmp(content)).getOrElse(decodeStub(kind, content))

  /** Batch feature extraction: per-partition iteration (codec init once per
    * partition, not per record), typed Dataset in/out. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition "codec" initialization would go here
      it.map { r =>
        val (w, h, feats) = decode(r.kind, r.content)
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
