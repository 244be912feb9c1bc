package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: media
  * (image/audio/video) ride as opaque `binary` columns with typed
  * metadata; decode / feature-extraction runs partition-batched.
  *
  * Three codecs are decoded FOR REAL, dependency-free: uncompressed
  * 24-bpp BMP (pixel parse), 8-bit PNG (chunk walk + JDK zlib inflate
  * + full None/Sub/Up/Average/Paeth filter reconstruction), and 16-bit
  * PCM WAV (sample parse → windowed-RMS features). Images yield
  * luminance-grid features and REAL nearest-neighbor resizes
  * (re-encoded in their own format). Payloads in any other format
  * fall back to the clearly-marked deterministic STUB (no JPEG/MP3/
  * video codecs in the JDK); everything Spark-side — schema,
  * partitioning, batch shape, null/corrupt handling — is real and
  * tested either way.
  *
  * Scale design: media bytes never enter a shuffle — decode happens in a
  * narrow `mapPartitions` projection before any wide op; downstream
  * stages carry only the small extracted features. Partition sizing is
  * the caller's lever (`repartition(n)` upstream; at 100 TB size input
  * splits so a partition's batch of decoded frames fits executor
  * memory).
  */
object Multimodal {

  // ---- real dependency-free codecs: 24-bpp BMP and 16-bit PCM WAV ----

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def i32le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private[graft] def isBmp(b: Array[Byte]): Boolean =
    b != null && b.length >= 2 && b(0) == 'B' && b(1) == 'M'

  private[graft] def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Decoded image: width, height, and row-major TOP-DOWN per-pixel
    * luminance in [0,1] (Rec.601 weights over the BGR samples). */
  private[graft] final case class DecodedImage(width: Int, height: Int,
      luma: Array[Float])

  /** Parse an uncompressed 24-bpp BMP (BITMAPINFOHEADER or larger,
    * BI_RGB) to row-major TOP-DOWN BGR bytes: rows are 4-byte aligned
    * in the file, bottom-up unless height is negative. Returns None on
    * any malformed/truncated/unsupported payload — a corrupt file must
    * flag decode_ok=false, never throw. */
  /** Header-declared dimensions are UNTRUSTED input: a crafted file can
    * claim widths whose pixel-buffer size wraps Int (negative array
    * size) or demands multi-GB allocations from a 100-byte payload (a
    * decompression bomb). All dimension math below runs in Long and is
    * capped here before any allocation. */
  private val MaxDecodedPixels = 1L << 26 // 67M px = ~200 MB RGB

  private[graft] def decodeBmpBgr(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try {
      if (!isBmp(b) || b.length < 54) return None
      val pixelOff = i32le(b, 10)
      val dibSize = i32le(b, 14)
      if (dibSize < 40) return None // BITMAPCOREHEADER not supported
      val width = i32le(b, 18)
      val rawHeight = i32le(b, 22)
      val bpp = u16le(b, 28)
      val compression = i32le(b, 30)
      if (width <= 0 || rawHeight == 0 || bpp != 24 || compression != 0)
        return None
      val height = math.abs(rawHeight)
      if (width.toLong * height > MaxDecodedPixels) return None
      val bottomUp = rawHeight > 0
      val rowSize = ((width.toLong * 3 + 3) / 4 * 4).toInt
      if (pixelOff < 0 || pixelOff.toLong + rowSize.toLong * height > b.length)
        return None
      val bgr = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = if (bottomUp) height - 1 - y else y
        System.arraycopy(b, pixelOff + srcRow * rowSize,
          bgr, y * width * 3, width * 3)
        y += 1
      }
      Some((width, height, bgr))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private[graft] def decodeBmp(b: Array[Byte]): Option[DecodedImage] =
    decodeBmpBgr(b).map { case (w, h, bgr) =>
      val luma = new Array[Float](w * h)
      var i = 0
      while (i < luma.length) {
        val bl = bgr(i * 3) & 0xff
        val g = bgr(i * 3 + 1) & 0xff
        val r = bgr(i * 3 + 2) & 0xff
        luma(i) = (0.299f * r + 0.587f * g + 0.114f * bl) / 255.0f
        i += 1
      }
      DecodedImage(w, h, luma)
    }

  /** Encode row-major top-down BGR pixels as a minimal uncompressed
    * 24-bpp BMP (54-byte header, bottom-up, 4-byte-aligned rows). */
  private[graft] def encodeBmp24(width: Int, height: Int,
      bgr: Array[Byte]): Array[Byte] = {
    require(bgr.length == width * height * 3, "bgr length mismatch")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val fileSize = 54 + rowSize * height
    val out = new Array[Byte](fileSize)
    def w32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    w32(2, fileSize); w32(10, 54); w32(14, 40)
    w32(18, width); w32(22, height)
    out(26) = 1 // planes
    out(28) = 24 // bpp
    w32(34, rowSize * height)
    var y = 0
    while (y < height) {
      // file rows are bottom-up; padding bytes stay zero
      System.arraycopy(bgr, y * width * 3,
        out, 54 + (height - 1 - y) * rowSize, width * 3)
      y += 1
    }
    out
  }

  /** Nearest-neighbor resample of top-down BGR pixels. */
  private[graft] def resampleBgr(bgr: Array[Byte], w: Int, h: Int,
      ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * h / oh).toInt
      var x = 0
      while (x < ow) {
        val sx = (x.toLong * w / ow).toInt
        val src = (sy * w + sx) * 3
        val dst = (y * ow + x) * 3
        out(dst) = bgr(src); out(dst + 1) = bgr(src + 1)
        out(dst + 2) = bgr(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- PNG (zlib lives in the JDK, so this codec is also real) ----

  private val pngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private[graft] def isPng(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && (0 until 8).forall(i => b(i) == pngSig(i))

  private def i32be(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Parse an 8-bit-depth non-interlaced PNG (gray / gray+alpha / RGB /
    * RGBA) to row-major top-down RGB bytes: walk chunks, inflate the
    * IDAT stream, undo the per-row filters (None/Sub/Up/Average/
    * Paeth). None on malformed/truncated/unsupported payloads. */
  private[graft] def decodePngRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try {
      if (!isPng(b)) return None
      var off = 8
      var width = 0; var height = 0; var colorType = -1; var ok = false
      val idat = new java.io.ByteArrayOutputStream()
      while (off + 8 <= b.length) {
        val len = i32be(b, off)
        val tpe = new String(b, off + 4, 4, "US-ASCII")
        if (len < 0 || off + 12 + len > b.length) return None
        tpe match {
          case "IHDR" =>
            if (len < 13) return None
            width = i32be(b, off + 8)
            height = i32be(b, off + 12)
            val bitDepth = b(off + 16)
            colorType = b(off + 17)
            val interlace = b(off + 20)
            ok = width > 0 && height > 0 && bitDepth == 8 &&
              interlace == 0 && Set(0, 2, 4, 6)(colorType)
            if (!ok) return None
          case "IDAT" => idat.write(b, off + 8, len)
          case _ => ()
        }
        off += 12 + len
      }
      if (!ok || idat.size() == 0) return None
      val channels = colorType match {
        case 0 => 1; case 4 => 2; case 2 => 3; case 6 => 4
      }
      if (width.toLong * height > MaxDecodedPixels ||
        (width.toLong * channels + 1) * height > Int.MaxValue) return None
      val stride = width * channels
      val raw = new Array[Byte]((stride + 1) * height)
      val inf = new java.util.zip.Inflater()
      var got = 0
      try {
        inf.setInput(idat.toByteArray)
        while (got < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, got, raw.length - got)
          // ANY zero-progress state exits: truncated input
          // (needsInput), preset-dictionary streams (needsDictionary —
          // inflate would otherwise return 0 forever), or a stuck
          // stream; only finished() with full output is success
          if (n == 0 && !inf.finished()) return None
          got += n
        }
      } finally inf.end()
      if (got < raw.length) return None
      // undo per-row filters in place (prev = reconstructed row above)
      val px = new Array[Byte](stride * height)
      var y = 0
      while (y < height) {
        val filter = raw(y * (stride + 1)) & 0xff
        val src = y * (stride + 1) + 1
        val dst = y * stride
        var x = 0
        while (x < stride) {
          val rawV = raw(src + x) & 0xff
          val a = if (x >= channels) px(dst + x - channels) & 0xff else 0
          val up = if (y > 0) px(dst - stride + x) & 0xff else 0
          val ul = if (y > 0 && x >= channels)
            px(dst - stride + x - channels) & 0xff else 0
          val rec = filter match {
            case 0 => rawV
            case 1 => rawV + a
            case 2 => rawV + up
            case 3 => rawV + (a + up) / 2
            case 4 => // Paeth predictor
              val p = a + up - ul
              val pa = math.abs(p - a); val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              rawV + (if (pa <= pb && pa <= pc) a
                      else if (pb <= pc) up else ul)
            case _ => return None
          }
          px(dst + x) = rec.toByte
          x += 1
        }
        y += 1
      }
      // expand to RGB
      val rgb = new Array[Byte](width * height * 3)
      var i = 0
      while (i < width * height) {
        colorType match {
          case 0 | 4 => // gray (+alpha dropped)
            val g = px(i * channels)
            rgb(i * 3) = g; rgb(i * 3 + 1) = g; rgb(i * 3 + 2) = g
          case 2 | 6 => // rgb (+alpha dropped)
            rgb(i * 3) = px(i * channels)
            rgb(i * 3 + 1) = px(i * channels + 1)
            rgb(i * 3 + 2) = px(i * channels + 2)
        }
        i += 1
      }
      Some((width, height, rgb))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private[graft] def decodePng(b: Array[Byte]): Option[DecodedImage] =
    decodePngRgb(b).map { case (w, h, rgb) =>
      val luma = new Array[Float](w * h)
      var i = 0
      while (i < luma.length) {
        val r = rgb(i * 3) & 0xff
        val g = rgb(i * 3 + 1) & 0xff
        val bl = rgb(i * 3 + 2) & 0xff
        luma(i) = (0.299f * r + 0.587f * g + 0.114f * bl) / 255.0f
        i += 1
      }
      DecodedImage(w, h, luma)
    }

  /** Encode row-major top-down RGB as a minimal 8-bit color-type-2 PNG
    * (filter 0 rows, one zlib IDAT). */
  private[graft] def encodePng(width: Int, height: Int,
      rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length mismatch")
    val stride = width * 3
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      // filter byte 0 already zero; copy the row after it
      System.arraycopy(rgb, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) zOut.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(pngSig, 0, 8)
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      val len = data.length
      def be(v: Int): Array[Byte] = Array((v >> 24).toByte,
        (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      out.write(be(len), 0, 4)
      val tb = tpe.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, len)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be(crc.getValue.toInt), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(2.toByte) // bit depth 8, color type RGB
      .put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    chunk("IHDR", ihdr)
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decoded audio: sample rate and mono-mixed samples in [-1,1]. */
  private[graft] final case class DecodedAudio(sampleRate: Int,
      samples: Array[Float])

  /** Parse a 16-bit PCM RIFF/WAVE payload (any channel count —
    * channels are mono-mixed). Walks the chunk list (sizes padded to
    * even per RIFF); None on malformed/truncated/non-PCM input. */
  private[graft] def decodeWav(b: Array[Byte]): Option[DecodedAudio] = {
    try {
      if (!isWav(b)) return None
      var off = 12
      var channels = 0
      var sampleRate = 0
      var fmtOk = false
      var samples: Array[Float] = null
      while (off + 8 <= b.length) {
        val id = new String(b, off, 4, "US-ASCII")
        val size = i32le(b, off + 4)
        if (size < 0 || off + 8 + size > b.length) return None
        if (id == "fmt ") {
          if (size < 16) return None
          val audioFormat = u16le(b, off + 8)
          channels = u16le(b, off + 10)
          sampleRate = i32le(b, off + 12)
          val bitsPerSample = u16le(b, off + 22)
          fmtOk = audioFormat == 1 && bitsPerSample == 16 && channels > 0
        } else if (id == "data") {
          if (!fmtOk) return None // fmt must precede data
          val nFrames = size / (2 * channels)
          val out = new Array[Float](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0.0f
            var c = 0
            while (c < channels) {
              val s = (u16le(b, off + 8 + (f * channels + c) * 2)).toShort
              acc += s / 32768.0f
              c += 1
            }
            out(f) = acc / channels
            f += 1
          }
          samples = out
        }
        off += 8 + size + (size & 1) // RIFF chunks pad to even
      }
      if (fmtOk && samples != null) Some(DecodedAudio(sampleRate, samples))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Mean-pool `xs` into `dim` contiguous cells (the grid feature for
    * images, row-major; empty cells → 0). */
  private[graft] def pooled(xs: Array[Float], dim: Int): Array[Float] =
    Array.tabulate(dim) { i =>
      val lo = (i.toLong * xs.length / dim).toInt
      val hi = ((i + 1).toLong * xs.length / dim).toInt
      if (hi <= lo) 0.0f
      else {
        var s = 0.0; var j = lo
        while (j < hi) { s += xs(j); j += 1 }
        (s / (hi - lo)).toFloat
      }
    }

  /** RMS energy of `dim` contiguous windows (the audio feature). */
  private[graft] def rmsWindows(xs: Array[Float], dim: Int): Array[Float] =
    Array.tabulate(dim) { i =>
      val lo = (i.toLong * xs.length / dim).toInt
      val hi = ((i + 1).toLong * xs.length / dim).toInt
      if (hi <= lo) 0.0f
      else {
        var s = 0.0; var j = lo
        while (j < hi) { s += xs(j).toDouble * xs(j); j += 1 }
        math.sqrt(s / (hi - lo)).toFloat
      }
    }

  /** Typed metadata accompanying every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("decode_ok", BooleanType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decode kernel — deterministic fake standing in for a real
    * image/audio decoder (no media libs in this container). Real
    * implementation would decode `payload` and pool pixel/spectral
    * features; the fake hashes byte windows so output is stable,
    * shaped correctly (`dim` floats), and corrupt-input behavior
    * (null/empty → decode_ok=false) is exercised for real. */
  private[llm] def decodeStub(payload: Array[Byte], dim: Int): Option[Array[Float]] =
    if (payload == null || payload.isEmpty) None
    else Some(Array.tabulate(dim) { i =>
      var h = 1125899906842597L
      var j = i % math.max(1, payload.length)
      val step = math.max(1, payload.length / 16)
      while (j < payload.length) {
        h = 31 * h + payload(j)
        j += step
      }
      ((h % 1000L).toFloat) / 1000.0f
    })

  /** Decode dispatch: payloads with a BMP, PNG or WAV signature decode
    * FOR REAL (luminance-grid / windowed-RMS features); a payload that
    * CLAIMS a real codec but fails to parse is corrupt (None — never
    * silently stubbed); anything else falls back to the deterministic
    * stub. */
  private[graft] def decodeFeature(payload: Array[Byte],
      dim: Int): Option[Array[Float]] =
    if (payload == null || payload.isEmpty) None
    else if (isBmp(payload)) decodeBmp(payload).map(d => pooled(d.luma, dim))
    else if (isPng(payload)) decodePng(payload).map(d => pooled(d.luma, dim))
    else if (isWav(payload))
      decodeWav(payload).map(d => rmsWindows(d.samples, dim))
    else decodeStub(payload, dim)

  /** Partition-batched decode+featurize: binary in, small feature row
    * out. One pass, no shuffle, media bytes dropped immediately after
    * decode. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media
      .select("media_id", "media_type", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val tpe = r.getString(1)
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          val nBytes = if (payload == null) 0L else payload.length.toLong
          decodeFeature(payload, dim) match {
            case Some(f) => Row(id, tpe, nBytes, true, f.toSeq)
            case None => Row(id, tpe, nBytes, false, null)
          }
        }
      }(enc)
  }

  private val resizeSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("out_width", IntegerType),
    StructField("out_height", IntegerType),
    StructField("out_payload", BinaryType)))

  /** Image resize: recompute typed dimension metadata for a target box
    * (aspect-preserving fit, never upscaling — metadata width/height is
    * the geometry source of truth) and transcode the payload. BMP and
    * PNG payloads are REALLY resampled (nearest-neighbor, re-encoded
    * in-format: 24-bpp BMP, 8-bit PNG); other formats (JPEG etc.) pass
    * through unchanged. Same narrow no-shuffle shape as
    * [[extractFeatures]]: pixels never ride an exchange. */
  def resizeImages(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height"),
      lit(1.0))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(resizeSchema)
    media.filter(col("media_type") === "image" &&
        col("width").isNotNull && col("height").isNotNull &&
        col("width") > 0 && col("height") > 0)
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
      .select("media_id", "out_width", "out_height", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val ow = r.getInt(1)
          val oh = r.getInt(2)
          val payload = if (r.isNullAt(3)) null else r.getAs[Array[Byte]](3)
          // resampleBgr is channel-order-agnostic over 3-byte pixels,
          // so it serves both codecs; each re-encodes in its own format
          val resized = decodeBmpBgr(payload) match {
            case Some((w, h, bgr)) if ow > 0 && oh > 0 &&
                (w != ow || h != oh) =>
              encodeBmp24(ow, oh, resampleBgr(bgr, w, h, ow, oh))
            case _ => decodePngRgb(payload) match {
              case Some((w, h, rgb)) if ow > 0 && oh > 0 &&
                  (w != ow || h != oh) =>
                encodePng(ow, oh, resampleBgr(rgb, w, h, ow, oh))
              case _ => payload // other formats (or already in box): as-is
            }
          }
          Row(r.getLong(0), ow, oh, resized)
        }
      }(enc)
  }

  /** Video frame-sampling plumbing: emit one row per sampled frame
    * index (every `everyMs` within duration) — the decode of each frame
    * is the same stub. Shows the explode-then-decode shape without
    * shuffling payloads: the payload column is carried into the explode
    * but dropped in the same projection. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media
      // duration_ms > 0 also guards the sequence() bounds: duration 0
      // would make (start 0, stop -1, step +everyMs) illegal at runtime
      .filter(col("media_type") === "video" && col("duration_ms") > 0)
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)))
          .as("frame_ms"))
      .select(col("media_id"), col("frame_ms"),
        length(col("payload")).cast("long").as("n_bytes"))

  /** 64-bit SimHash of a binary payload from its chunked xxhash64s —
    * near-duplicate detection for media blobs WITHOUT decoding them:
    * re-encodes/minor edits that leave most `chunkBytes`-sized chunks
    * identical produce signatures within a small hamming distance.
    * Map-only (length + substring + hash per chunk, one 8-byte
    * signature out; payload bytes never enter a shuffle). Null
    * signature for empty payloads. */
  def payloadSimhash(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload", chunkBytes: Int = 64): DataFrame = {
    val starts = when(length(col(payloadCol)) > 0,
      sequence(lit(1), length(col(payloadCol)), lit(chunkBytes)))
      .otherwise(array())
    media.select(col(idCol).as("id"),
        transform(starts,
          i => xxhash64(col(payloadCol).substr(i, lit(chunkBytes))))
          .as("__chunks"))
      .select(col("id"),
        graft.plans.VectorExpressions.simhash64(col("__chunks"))
          .as("simhash"))
  }

  /** Near-duplicate media pairs (hamming <= maxHamming over the chunk
    * simhash), via the same pigeonhole banding as text simhash dedup. */
  def payloadNearDups(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload", chunkBytes: Int = 64,
      maxHamming: Int = 6): DataFrame =
    graft.llm.Dedup.simhashNearDupsFromSig(
      payloadSimhash(media, idCol, payloadCol, chunkBytes)
        .filter(col("simhash").isNotNull),
      maxHamming)
}
