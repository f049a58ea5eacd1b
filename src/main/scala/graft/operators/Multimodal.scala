package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media travels as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs per-partition in batches so a real codec
  * library would amortize model/codec init across a partition (the Scala
  * analogue of `mapInPandas` batch shape).
  *
  * Decode is REAL for the library-free formats — PPM/PGM (P6/P5) and
  * uncompressed 24-bit BMP are header + raw pixels, PNG (8-bit gray /
  * truecolor, non-interlaced) is zlib via the JDK's Inflater plus the five
  * scanline filters, GIF (87a/89a, first frame, interlaced or not) is a
  * palette raster behind a hand-rolled variable-width LZW decoder, and WAV
  * (RIFF PCM 16-bit) is chunked headers + raw samples — all parsed here
  * directly (dimensions + feature vectors, spec'd against hand-built
  * payloads). JPEG decodes through the JDK's own baseline reader
  * (`javax.imageio.ImageIO`, part of every JDK — still zero external
  * dependencies), leaving a STUB only for the formats with no JDK codec
  * (MP3, H.264…), since this container ships no codec libraries. Malformed or
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

  /** Real PPM/PGM (P6 color / P5 grayscale, 8-bit maxval) parse: ASCII
    * header `P6|P5 <w> <h> <maxval>` with `#` comments, then raw pixels —
    * interleaved RGB for P6, one gray byte per pixel for P5 (replicated to
    * R=G=B for the feature kernel, like PNG grayscale). None on any
    * malformation. */
  private[graft] def decodePpm(content: Array[Byte]): Option[(Int, Int, Array[Float])] =
    rasterPpm(content).map { case (w, h, rgb) => (w, h, pixelFeatures(w, h, rgb)) }

  private[graft] def rasterPpm(content: Array[Byte]): Option[(Int, Int, Int => Int)] = {
    if (content.length < 2 || content(0) != 'P' ||
        (content(1) != '6' && content(1) != '5')) return None
    val gray = content(1) == '5'
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
      // bounded: a header dimension with >9 digits can't be a sane image and
      // would overflow Int.parseInt — malformed, so None (never throw)
      if (pos == start || pos - start > 9) None
      else Some(new String(content, start, pos - start).toInt)
    }
    val chans = if (gray) 1L else 3L
    for {
      w <- nextInt(); h <- nextInt(); maxval <- nextInt()
      if w > 0 && h > 0 && maxval == 255 && pos + 1 + chans * w * h <= content.length
    } yield {
      val base = pos + 1 // exactly one whitespace byte after maxval per spec
      if (gray) (w, h, (i: Int) => content(base + i / 3) & 0xff)
      else (w, h, (i: Int) => content(base + i) & 0xff)
    }
  }

  /** Real BMP parse: uncompressed 24-bit BITMAPINFOHEADER only (the
    * library-free common case). Rows are 4-byte padded, stored bottom-up
    * (negative height = top-down). None on any other variant. */
  private[graft] def decodeBmp(content: Array[Byte]): Option[(Int, Int, Array[Float])] =
    rasterBmp(content).map { case (w, h, rgb) => (w, h, pixelFeatures(w, h, rgb)) }

  private[graft] def rasterBmp(content: Array[Byte]): Option[(Int, Int, Int => Int)] = {
    def u16(o: Int) = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
    def i32(o: Int) = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8) |
      ((content(o + 2) & 0xff) << 16) | ((content(o + 3) & 0xff) << 24)
    if (content.length < 54 || content(0) != 'B' || content(1) != 'M') return None
    val dataOff = i32(10); val w = i32(18); val hRaw = i32(22)
    val h = math.abs(hRaw); val topDown = hRaw < 0
    if (w <= 0 || h == 0 || u16(28) != 24 || i32(30) != 0) return None
    // row stride in Long: 3*w overflows Int for w ≳ 7e8, making rowBytes
    // negative and the extent guard below vacuously true (ADVICE r5)
    val rowBytesL = (3L * w + 3) / 4 * 4
    if (dataOff < 54 || dataOff.toLong + rowBytesL * h > content.length) return None
    val rowBytes = rowBytesL.toInt // extent ≤ content.length < 2^31 ⇒ fits
    Some((w, h, { i: Int =>
      val px = i / 3; val ch = i % 3 // BGR on disk → map R/G/B request to 2/1/0
      val row = px / w; val diskRow = if (topDown) row else h - 1 - row
      content(dataOff + diskRow * rowBytes + (px % w) * 3 + (2 - ch)) & 0xff
    }))
  }

  /** Real PNG parse using only the JDK: PNG is zlib-compressed scanlines
    * (java.util.zip.Inflater) plus five per-scanline byte filters — no
    * external codec needed. Supported: 8-bit depth, grayscale (color type 0)
    * and truecolor RGB (color type 2), non-interlaced, all five filter types
    * (None/Sub/Up/Average/Paeth, RFC 2083 §6). Anything else — palette,
    * alpha, 16-bit, Adam7 — returns None and falls back. Ancillary chunks
    * are skipped; IDAT chunks are concatenated before inflating, per spec. */
  private[graft] def decodePng(content: Array[Byte]): Option[(Int, Int, Array[Float])] =
    rasterPng(content).map { case (w, h, rgb) => (w, h, pixelFeatures(w, h, rgb)) }

  private[graft] def rasterPng(content: Array[Byte]): Option[(Int, Int, Int => Int)] = {
    val sig = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    // minimum: 8 sig + 25 IHDR chunk (len+type+13 data+crc)
    if (content.length < 33) return None
    var i = 0
    while (i < 8) { if (content(i) != sig(i)) return None; i += 1 }
    def u32(o: Int): Long =
      ((content(o) & 0xffL) << 24) | ((content(o + 1) & 0xffL) << 16) |
        ((content(o + 2) & 0xffL) << 8) | (content(o + 3) & 0xffL)
    def chunkType(o: Int): String = new String(content, o, 4, "US-ASCII")
    var pos = 8
    if (u32(pos) != 13 || chunkType(pos + 4) != "IHDR") return None
    val w = u32(pos + 8); val h = u32(pos + 12)
    val bitDepth = content(pos + 16) & 0xff; val colorType = content(pos + 17) & 0xff
    val compression = content(pos + 18) & 0xff; val filterMethod = content(pos + 19) & 0xff
    val interlace = content(pos + 20) & 0xff
    if (w <= 0 || h <= 0 || bitDepth != 8 || (colorType != 0 && colorType != 2) ||
        compression != 0 || filterMethod != 0 || interlace != 0) return None
    val channels = if (colorType == 2) 3 else 1
    // bound the decoded size in Long BEFORE allocating (the BMP lesson):
    // h scanlines of (1 filter byte + channels*w)
    val stride = channels.toLong * w
    val rawLen = (stride + 1) * h
    if (rawLen > Int.MaxValue - 16) return None
    pos += 8 + 13 + 4
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && pos + 8 <= content.length) {
      val len = u32(pos)
      if (pos + 8 + len + 4 > content.length) return None // truncated chunk
      val typ = chunkType(pos + 4)
      if (typ == "IDAT") idat.write(content, pos + 8, len.toInt)
      else if (typ == "IEND") sawEnd = true
      pos += 8 + len.toInt + 4
    }
    if (idat.size() == 0) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inflater = new java.util.zip.Inflater()
    try {
      inflater.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val got = inflater.inflate(raw, off, raw.length - off)
        if (got == 0 && (inflater.needsInput() || inflater.needsDictionary()))
          return None // truncated / preset-dictionary stream
        off += got
      }
      if (off < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    // unfilter scanlines (RFC 2083 §6.1-6.6): each reconstructed byte depends
    // on left (a), up (b), upper-left (c) RECONSTRUCTED bytes
    val wi = w.toInt; val hi = h.toInt; val si = stride.toInt
    val px = new Array[Byte](si * hi)
    var y = 0
    while (y < hi) {
      val rowOff = y * (si + 1)
      val ft = raw(rowOff) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < si) {
        val cur = raw(rowOff + 1 + x) & 0xff
        val a = if (x >= channels) px(y * si + x - channels) & 0xff else 0
        val b = if (y > 0) px((y - 1) * si + x) & 0xff else 0
        val c = if (x >= channels && y > 0) px((y - 1) * si + x - channels) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + ((a + b) / 2)
          case _ => // Paeth predictor
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        px(y * si + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((wi, hi, { j: Int =>
      if (channels == 3) px(j) & 0xff
      else px(j / 3) & 0xff // grayscale: replicate the gray byte to R,G,B
    }))
  }

  /** Real GIF parse using only the JDK, per the public GIF89a
    * specification (CompuServe, 1990) and its LZW variant (Welch, IEEE
    * Computer 1984): a palette raster behind LZW with variable-width codes
    * (up to 12 bits, LSB-first bit packing). Supported: the FIRST image frame, global or local color
    * table, interlaced or sequential row order; extension blocks (graphic
    * control, comments, application) are skipped. Anything malformed — bad
    * code stream, truncated sub-blocks, missing color table — returns None
    * and falls back, the standing posture. Animation beyond frame 1 is out
    * of scope (frame composition/disposal is a video concern, see
    * [[sampleFrames]]). */
  private[graft] def decodeGif(content: Array[Byte]): Option[(Int, Int, Array[Float])] =
    rasterGif(content).map { case (w, h, rgb) => (w, h, pixelFeatures(w, h, rgb)) }

  private[graft] def rasterGif(content: Array[Byte]): Option[(Int, Int, Int => Int)] = {
    if (content.length < 14) return None
    val hdr = new String(content, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    def u16(o: Int) = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
    var pos = 6
    val packed = content(pos + 4) & 0xff
    pos += 7 // logical screen descriptor
    var table = -1 // color table offset
    var tableLen = 0
    if ((packed & 0x80) != 0) {
      tableLen = 1 << ((packed & 7) + 1)
      table = pos
      pos += 3 * tableLen
      if (pos > content.length) return None
    }
    // walk blocks to the first image descriptor
    while (pos < content.length && (content(pos) & 0xff) == 0x21) {
      pos += 2 // extension introducer + label
      while (pos < content.length && content(pos) != 0) pos += 1 + (content(pos) & 0xff)
      pos += 1 // block terminator
    }
    if (pos + 10 > content.length || (content(pos) & 0xff) != 0x2c) return None
    val w = u16(pos + 5); val h = u16(pos + 7)
    val ipacked = content(pos + 9) & 0xff
    val interlaced = (ipacked & 0x40) != 0
    pos += 10
    if ((ipacked & 0x80) != 0) { // local color table overrides
      tableLen = 1 << ((ipacked & 7) + 1)
      table = pos
      pos += 3 * tableLen
    }
    if (w <= 0 || h <= 0 || table < 0 || table + 3 * tableLen > content.length ||
        pos >= content.length) return None
    if (3L * w * h > Int.MaxValue - 16) return None // bound BEFORE allocating
    val minCode = content(pos) & 0xff
    if (minCode < 2 || minCode > 8) return None
    pos += 1
    // concatenate data sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (pos < content.length && content(pos) != 0) {
      val len = content(pos) & 0xff
      if (pos + 1 + len > content.length) return None
      data.write(content, pos + 1, len)
      pos += 1 + len
    }
    val bytes = data.toByteArray
    if (bytes.isEmpty) return None
    // LZW decode, variable code width, LSB-first
    val clear = 1 << minCode; val endCode = clear + 1
    val prefix = new Array[Int](4096); val suffix = new Array[Int](4096)
    var dictSize = endCode + 1
    var width = minCode + 1
    var prev = -1
    val out = new Array[Byte](w * h)
    var outPos = 0
    var acc = 0L; var accBits = 0; var bi = 0
    val stack = new Array[Int](4097)
    def emit(code: Int): Int = { // expand `code` into out; returns its FIRST index
      var sp = 0; var c = code
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c
      if (outPos + sp + 1 > out.length) return -1 // more pixels than w*h
      out(outPos) = c.toByte; outPos += 1
      while (sp > 0) { sp -= 1; out(outPos) = stack(sp).toByte; outPos += 1 }
      first
    }
    var done = false
    while (!done && outPos < out.length) {
      while (accBits < width && bi < bytes.length) {
        acc |= (bytes(bi) & 0xffL) << accBits; accBits += 8; bi += 1
      }
      if (accBits < width) return None // truncated code stream
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; accBits -= width
      if (code == clear) { dictSize = endCode + 1; width = minCode + 1; prev = -1 }
      else if (code == endCode) done = true
      else if (prev == -1) {
        if (code >= clear) return None // first code must be a root
        if (emit(code) < 0) return None
        prev = code
      } else {
        if (code > dictSize || (code == dictSize && dictSize >= 4096)) return None
        val toExpand = if (code == dictSize) prev else code
        val first = emit(toExpand)
        if (first < 0) return None
        if (code == dictSize) { // KwKwK case: sequence is prev + first(prev)
          if (outPos >= out.length) return None
          out(outPos) = first.toByte; outPos += 1
        }
        if (dictSize < 4096) {
          // the new entry is prev's sequence + the first byte of the
          // CURRENT output (identical rule in the KwKwK case)
          prefix(dictSize) = prev
          suffix(dictSize) = first
          dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    if (outPos < out.length) return None // not enough pixels decoded
    // interlace: rows arrive in 4 passes (0,8..; 4,12..; 2,6..; 1,3..)
    val rowMap = new Array[Int](h)
    if (interlaced) {
      var r = 0
      for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- start until h by step) {
        rowMap(r) = y; r += 1
      }
    } else { var y = 0; while (y < h) { rowMap(y) = y; y += 1 } }
    val inv = new Array[Int](h) // display row -> decoded row
    var r2 = 0
    while (r2 < h) { inv(rowMap(r2)) = r2; r2 += 1 }
    val tl = tableLen
    Some((w, h, { i: Int =>
      val px = i / 3; val ch = i % 3
      val row = px / w
      val idx = out(inv(row) * w + px % w) & 0xff
      if (idx >= tl) 0 else content(table + 3 * idx + ch) & 0xff
    }))
  }

  /** Real JPEG decode via the JDK's built-in baseline reader
    * (`javax.imageio.ImageIO` — in every JDK since 1.4, so the repo's
    * no-external-deps posture holds). Accepts only payloads opening with
    * the JPEG SOI marker (FF D8 FF) so the hand-rolled parsers keep
    * owning their formats and ImageIO's PNG/BMP/GIF readers are never
    * consulted; anything its reader rejects (arithmetic-coded, truncated,
    * exotic colorspaces) returns None and falls back, the standing
    * posture. Pixels surface through the same interleaved-RGB accessor as
    * every other raster, so [[extractFeatures]] and [[resizeImage]] work
    * unchanged. */
  private[graft] def decodeJpeg(content: Array[Byte]): Option[(Int, Int, Array[Float])] =
    rasterJpeg(content).map { case (w, h, rgb) => (w, h, pixelFeatures(w, h, rgb)) }

  private[graft] def rasterJpeg(content: Array[Byte]): Option[(Int, Int, Int => Int)] = {
    if (content.length < 3 || (content(0) & 0xff) != 0xff ||
        (content(1) & 0xff) != 0xd8 || (content(2) & 0xff) != 0xff) return None
    // no temp-file disk cache on executors (idempotent global toggle)
    javax.imageio.ImageIO.setUseCache(false)
    // the reader throws (not null) on truncated scans — degrade to None
    // here so this parser honors the never-throw contract on its own
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0 || 3L * w * h > Int.MaxValue - 16) return None
    // materialize packed ARGB once (colorspace conversion happens here);
    // the accessor is then pure index arithmetic like the other rasters
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    Some((w, h, { i: Int =>
      val px = i / 3; val ch = i % 3
      (argb(px) >>> (8 * (2 - ch))) & 0xff
    }))
  }

  /** Real WAV (RIFF, PCM 16-bit) parse — audio's library-free common case,
    * extending real decode beyond rasters. Returns audio's "dimensions" in
    * the (width, height) slots — (channels, sample rate) — plus a 16-dim
    * feature vector: [RMS amplitude, zero-crossing rate, mean |amplitude|,
    * 13-bin |amplitude| histogram], amplitudes normalized to [0,1] over all
    * interleaved samples. Chunks are word-aligned per RIFF; anything not
    * 16-bit integer PCM returns None and falls back. */
  /** WAV (RIFF/PCM16) header parse shared by the time-domain features and
    * the spectral path: (channels, rate, data offset, sample count). */
  private[graft] def wavPcm(content: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def u16(o: Int) = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (content(o) & 0xffL) | ((content(o + 1) & 0xffL) << 8) |
      ((content(o + 2) & 0xffL) << 16) | ((content(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(content, o, 4, "US-ASCII")
    if (content.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var fmtOk = false; var channels = 0; var rate = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= content.length && (dataOff < 0 || !fmtOk)) {
      val id = tag(pos); val len = u32(pos + 4)
      if (pos + 8 + len > content.length) return None // truncated chunk
      if (id == "fmt " && len >= 16) {
        val audioFormat = u16(pos + 8)
        channels = u16(pos + 10)
        val r = u32(pos + 12)
        val bits = u16(pos + 22)
        if (audioFormat != 1 || bits != 16 || channels < 1 || channels > 8 ||
            r <= 0 || r > 1000000) return None
        rate = r.toInt
        fmtOk = true
      } else if (id == "data") { dataOff = pos + 8; dataLen = len.toInt }
      pos += 8 + len.toInt + (len.toInt & 1) // word alignment
    }
    if (!fmtOk || dataOff < 0 || dataLen < 2) return None
    Some((channels, rate, dataOff, dataLen / 2))
  }

  private[graft] def decodeWav(content: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    val (channels, rate, dataOff, n) = wavPcm(content) match {
      case Some(t) => t
      case None => return None
    }
    val feats = new Array[Float](16)
    var sumSq = 0.0; var sumAbs = 0.0; var zc = 0; var prevSign = 0
    var i = 0
    while (i < n) {
      val o = dataOff + 2 * i
      val s = ((content(o) & 0xff) | (content(o + 1) << 8)).toShort.toInt
      val a = math.abs(s) / 32768.0
      sumSq += a * a; sumAbs += a
      val sign = Integer.signum(s)
      if (sign != 0) {
        if (prevSign != 0 && sign != prevSign) zc += 1
        prevSign = sign
      }
      feats(3 + math.min((a * 13).toInt, 12)) += 1.0f
      i += 1
    }
    feats(0) = math.sqrt(sumSq / n).toFloat
    feats(1) = if (n > 1) zc.toFloat / (n - 1) else 0.0f
    feats(2) = (sumAbs / n).toFloat
    var j = 3; while (j < 16) { feats(j) /= n.toFloat; j += 1 }
    Some((channels, rate, feats))
  }

  /** Decode dispatch: real parser when the payload self-identifies as a
    * library-free format, stub otherwise (including malformed payloads —
    * fall back, never throw: one corrupt file must not kill the scan).
    * The NonFatal backstop makes that posture structural, not per-parser:
    * any malformation a parser's own guards miss still degrades to the
    * stub instead of failing the partition (ADVICE r5). */
  private[graft] def decode(kind: String, content: Array[Byte]): (Int, Int, Array[Float]) =
    try decodePpm(content).orElse(decodeBmp(content)).orElse(decodePng(content))
      .orElse(decodeGif(content)).orElse(decodeJpeg(content)).orElse(decodeWav(content))
      .getOrElse(decodeStub(kind, content))
    catch { case scala.util.control.NonFatal(_) => decodeStub(kind, content) }

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

  /** In-place iterative radix-2 Cooley–Tukey FFT (the textbook
    * bit-reversal + butterfly form; Cooley & Tukey, Math. Comp. 1965).
    * `re`/`im` length must be a power of two. JDK-only — the audio
    * spectral path needs no native DSP library. */
  private[graft] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"FFT length must be a power of 2, got $n")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(blk + k); val ui = im(blk + k)
          val vr = re(blk + k + len / 2) * cr - im(blk + k + len / 2) * ci
          val vi = re(blk + k + len / 2) * ci + im(blk + k + len / 2) * cr
          re(blk + k) = ur + vr; im(blk + k) = ui + vi
          re(blk + k + len / 2) = ur - vr; im(blk + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Frequency-domain WAV features over the first power-of-2 window
    * (≤ 4096 samples, channel-0, Hann-windowed): peak frequency, spectral
    * centroid, 85% rolloff, and bandwidth (centroid-weighted stddev) in
    * Hz — the audio-quality/content signals (tone vs noise vs speech-ish)
    * a 100 TB audio curation pass bins on. Per-record row-local work on
    * a ≤ 4096-point FFT; non-WAV or too-short payloads are dropped (None),
    * the decode posture. */
  private[graft] def wavSpectral(content: Array[Byte]): Option[(Int, Int, Double, Double, Double, Double)] = {
    val (channels, rate, dataOff, nTotal) = wavPcm(content) match {
      case Some(t) => t
      case None => return None
    }
    val frames = nTotal / channels
    if (frames < 64) return None
    var n = 64
    while (n * 2 <= math.min(frames, 4096)) n *= 2
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) {
      val o = dataOff + 2 * i * channels // channel 0 of frame i
      val s = ((content(o) & 0xff) | (content(o + 1) << 8)).toShort.toInt / 32768.0
      // Hann window kills the rectangular window's spectral leakage
      val w = 0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (n - 1)))
      re(i) = s * w
      i += 1
    }
    fft(re, im)
    val half = n / 2
    val mag = new Array[Double](half)
    var total = 0.0
    var peakK = 0
    var k = 0
    while (k < half) {
      mag(k) = math.sqrt(re(k) * re(k) + im(k) * im(k))
      total += mag(k)
      if (mag(k) > mag(peakK)) peakK = k
      k += 1
    }
    if (total <= 0.0) return None
    val hzPerBin = rate.toDouble / n
    var cSum = 0.0
    k = 0
    while (k < half) { cSum += k * mag(k); k += 1 }
    val centroidBin = cSum / total
    var vSum = 0.0
    k = 0
    while (k < half) { vSum += (k - centroidBin) * (k - centroidBin) * mag(k); k += 1 }
    val bandwidthBin = math.sqrt(vSum / total)
    // 85% rolloff: smallest bin whose cumulative magnitude reaches 85%
    var acc = 0.0; var roll = half - 1; var found = false
    k = 0
    while (k < half && !found) {
      acc += mag(k)
      if (acc >= 0.85 * total) { roll = k; found = true }
      k += 1
    }
    Some((rate, n, peakK * hzPerBin, centroidBin * hzPerBin,
      roll * hzPerBin, bandwidthBin * hzPerBin))
  }

  /** Batch spectral extraction: (media_id, rate, n_fft, peak_hz,
    * centroid_hz, rolloff_hz, bandwidth_hz); non-audio records drop. */
  def audioSpectral(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      wavSpectral(r.content).map { case (rate, n, peak, cent, roll, bw) =>
        (r.media_id, rate, n, peak, cent, roll, bw)
      }
    }.toDF("media_id", "rate", "n_fft", "peak_hz", "centroid_hz", "rolloff_hz", "bandwidth_hz")
  }

  /** Raster dispatch for the library-free image formats: (w, h, rgb accessor)
    * with `rgb(i)` yielding interleaved R,G,B bytes for w*h pixels — the
    * shared substrate of [[extractFeatures]] and [[resizeImage]]. None (not
    * throw) on anything unrecognized or malformed, same posture as decode. */
  private[graft] def decodeRaster(content: Array[Byte]): Option[(Int, Int, Int => Int)] =
    try rasterPpm(content).orElse(rasterBmp(content)).orElse(rasterPng(content))
      .orElse(rasterGif(content)).orElse(rasterJpeg(content))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Nearest-neighbor resize of any raster-decodable payload, re-encoded as
    * P6 PPM (the pipeline's canonical uncompressed interchange — the output
    * feeds [[decode]]/[[extractFeatures]] directly). Source pixel for output
    * (x, y) is (⌊x·w/outW⌋, ⌊y·h/outH⌋) — deterministic, engine-replayable
    * integer arithmetic, no filtering kernel. None for non-raster payloads
    * (resizing audio bytes is meaningless, not an error). */
  def resizeImage(content: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    require(outW > 0 && outH > 0, s"resize dims must be positive, got ${outW}x$outH")
    decodeRaster(content).map { case (w, h, rgb) =>
      val header = s"P6\n$outW $outH\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + 3 * outW * outH)
      System.arraycopy(header, 0, out, 0, header.length)
      var o = header.length
      var y = 0
      while (y < outH) {
        val sy = (y.toLong * h / outH).toInt
        var x = 0
        while (x < outW) {
          val sx = (x.toLong * w / outW).toInt
          val p = 3 * (sy * w + sx)
          out(o) = rgb(p).toByte; out(o + 1) = rgb(p + 1).toByte
          out(o + 2) = rgb(p + 2).toByte
          o += 3; x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Batch resize: per-partition iteration like [[extractFeatures]] (a real
    * resampling library would init once per partition). Non-raster payloads
    * yield a null image column — the row survives, the scan never fails. */
  def resizeImages(records: Dataset[MediaRecord], outW: Int, outH: Int): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map(r => (r.media_id, r.kind, resizeImage(r.content, outW, outH).orNull))
    }.toDF("media_id", "kind", "image")
  }

  /** Encode raw interleaved-RGB pixels as an uncompressed 24-bit
    * BITMAPINFOHEADER BMP — the inverse of [[rasterBmp]] (bottom-up rows,
    * 4-byte row padding). `rgb(i)` yields interleaved R,G,B for `w*h`
    * pixels. Round-trip `rasterBmp(encodeBmp(w, h, f))` is pixel-identical,
    * which is what lets a catalog query drive the REAL byte-level
    * encode→decode path while its DuckDB oracle replays only the pixel
    * arithmetic: any drift in either codec flips the query hash. */
  def encodeBmp(w: Int, h: Int, rgb: Int => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"BMP dims must be positive, got ${w}x$h")
    val rowBytes = (3 * w + 3) / 4 * 4
    val size = 54 + rowBytes * h
    val out = new Array[Byte](size)
    def p16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def p32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    p32(2, size); p32(10, 54) // file size, pixel-data offset
    p32(14, 40); p32(18, w); p32(22, h) // BITMAPINFOHEADER, positive h = bottom-up
    p16(26, 1); p16(28, 24); p32(30, 0) // 1 plane, 24 bpp, BI_RGB
    p32(34, rowBytes * h)
    var y = 0
    while (y < h) {
      val base = 54 + (h - 1 - y) * rowBytes // bottom-up storage
      var x = 0
      while (x < w) {
        val p = 3 * (y * w + x)
        // disk order is BGR
        out(base + 3 * x) = rgb(p + 2).toByte
        out(base + 3 * x + 1) = rgb(p + 1).toByte
        out(base + 3 * x + 2) = rgb(p).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Exact integer raster statistics: per-channel byte sums and the
    * integer-luma sum over the decoded pixels — the all-integer feature
    * form that lets a multimodal pipeline be hash-compared across engines
    * (where [[extractFeatures]]'s normalized floats cannot be). Non-raster
    * payloads are dropped. */
  def rasterStats(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        decodeRaster(r.content).map { case (w, h, rgb) =>
          var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
          val n = w * h
          var i = 0
          while (i < n) {
            val cr = rgb(3 * i); val cg = rgb(3 * i + 1); val cb = rgb(3 * i + 2)
            sr += cr; sg += cg; sb += cb
            sl += (299 * cr + 587 * cg + 114 * cb) / 1000
            i += 1
          }
          (r.media_id, w, h, sr, sg, sb, sl)
        }
      }
    }.toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b", "sum_luma")
  }

  /** 64-bit average-hash (aHash) perceptual image fingerprint: decode the
    * raster, partition it into an 8×8 grid of pixel blocks (pixel x maps to
    * block bx = ⌊8x/w⌋, likewise y), and set bit
    * p = by·8 + bx iff the block's integer-luma sum is strictly above the
    * image mean — compared by exact cross-multiplication
    * `blockSum · totalPixels > totalSum · blockPixels`, so no division and
    * no float enters the hash. Luma is the same integer Rec.601 form the
    * feature kernel uses: (299·r + 587·g + 114·b) / 1000.
    *
    * Output: (media_id, width, height, h_hi, h_lo, b0..b3) — the hash as
    * two 32-bit halves (bits 32..63 / 0..31, both nonneg in a LONG) plus
    * its four 16-bit LSH bands for banded Hamming candidate joins (b0 =
    * lowest 16 bits). Non-raster payloads are dropped (dedup over images
    * only — the caller filters kinds upstream if it wants an error path).
    *
    * At scale this is the image twin of SimHash dedup (q35): the hash is a
    * per-row scan product, candidates come from 4 band equi joins, and the
    * ≤64-bit Hamming check runs only on band-colliding pairs — never
    * all-pairs. */
  def imageAHash(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        decodeRaster(r.content).map { case (w, h, rgb) =>
          val blockSum = new Array[Long](64)
          var totalSum = 0L
          var y = 0
          while (y < h) {
            val by = y * 8 / h
            var x = 0
            while (x < w) {
              val p = 3 * (y * w + x)
              val l = (299 * rgb(p) + 587 * rgb(p + 1) + 114 * rgb(p + 2)) / 1000
              blockSum(by * 8 + (x * 8 / w)) += l
              totalSum += l
              x += 1
            }
            y += 1
          }
          val totalPx = w.toLong * h
          var hi = 0L; var lo = 0L
          var p = 0
          while (p < 64) {
            val bx = p % 8; val by = p / 8
            // block pixel count: #{x : ⌊8x/w⌋ = bx} = ⌈(bx+1)w/8⌉ − ⌈bx·w/8⌉
            // (ceil bounds — floor bounds disagree when 8 ∤ w, e.g. w=10)
            val x0 = (bx * w + 7) / 8; val x1 = ((bx + 1) * w + 7) / 8
            val y0 = (by * h + 7) / 8; val y1 = ((by + 1) * h + 7) / 8
            val blockPx = (x1 - x0).toLong * (y1 - y0)
            if (blockPx > 0 && blockSum(p) * totalPx > totalSum * blockPx) {
              if (p < 32) lo |= 1L << p else hi |= 1L << (p - 32)
            }
            p += 1
          }
          (r.media_id, w, h, hi, lo,
            lo & 0xffffL, (lo >> 16) & 0xffffL, hi & 0xffffL, (hi >> 16) & 0xffffL)
        }
      }
    }.toDF("media_id", "width", "height", "h_hi", "h_lo", "b0", "b1", "b2", "b3")
  }
}
