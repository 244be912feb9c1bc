package graft

import graft.etl.Medallion
import graft.llm.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class EtlMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("newsToSilver dedups titles and formats the microsecond datetime") {
    val bronze = Seq(
      ("T1", "body", "2024-01-05", Seq("energy"), false, "wnp.pl"),
      ("T1", "body dup", "2024-01-06", Seq("energy"), false, "wnp.pl"),
      ("T2", "other", "2024-01-07", Seq("gas"), true, "beurs.nl"))
      .toDF("title", "text", "date", "keywords", "is_premium", "source_site")
    val out = Medallion.newsToSilver(bronze)
    assert(out.count() == 2)
    val dt = out.filter(col("title") === "T2").select("datetime")
      .as[String].collect().head
    assert(dt == "2024-01-07T00:00:00.000000")
  }

  test("normalizeArticleDate handles all three source-site formats") {
    val df = Seq(
      ("06-03-2024 05:57", "wnp.pl"),
      ("Dodano: 06-03-2024\n05:57", "wnp.pl"),
      ("2023-05-08 06:47:31", "wysokienapiecie.pl"),
      ("maandag 8 mei 2023 06:47", "beurs.nl"),
      ("2024-02-01", "other.site"))
      .toDF("date", "source_site")
    val out = df.select(Medallion.normalizeArticleDate(
      col("date"), col("source_site")).cast("string").as("dt"))
      .as[String].collect()
    assert(out.toSeq == Seq(
      "2024-03-06 05:57:00", "2024-03-06 05:57:00",
      "2023-05-08 06:47:00", "2023-05-08 06:47:00", "2024-02-01 00:00:00"))
  }

  test("quotesToSilver explodes per-symbol update arrays, unions, dedups") {
    val upd = StructType(Seq(
      StructField("price", DoubleType), StructField("volume", DoubleType),
      StructField("volatility", DoubleType),
      StructField("bid_ask_spread", DoubleType),
      StructField("market_sentiment", DoubleType),
      StructField("trading_activity", DoubleType),
      StructField("timestamp", LongType), StructField("source", StringType)))
    val schema = StructType(Seq(
      StructField("timestamp", LongType),
      StructField("updates_XOM", ArrayType(upd)),
      StructField("updates_BP", ArrayType(upd))))
    def u(p: Double, ts: Long) = Row(p, 1e6, 0.4, 0.1, 0.0, 50.0, ts, "YLIFE")
    val bronze = spark.createDataFrame(
      java.util.List.of(
        Row(1000L, java.util.List.of(u(100.0, 1L), u(101.0, 2L)),
          java.util.List.of(u(30.0, 1L))),
        Row(2000L, java.util.List.of(u(100.0, 1L)), // dup of (1000? no: record_ts differs
          java.util.List.of(u(31.0, 2L)))),
      schema)
    val out = Medallion.quotesToSilver(bronze, Seq("XOM", "BP"))
    assert(out.count() == 5)
    assert(out.filter(col("company") === "XOM").count() == 3)
    assert(out.columns.toSet.contains("update_timestamp"))
  }

  test("gold daily aggregates + keyword counts") {
    val silverNews = Seq(
      ("T1", "2024-01-05T00:00:00.000000", Seq("energy", "gas"), "wnp.pl"),
      ("T2", "2024-01-05T00:00:00.000000", Seq("energy"), "wnp.pl"),
      ("T3", "2024-01-06T00:00:00.000000", Seq("oil"), "beurs.nl"))
      .toDF("title", "datetime", "keywords", "source_site")
    val counts = Medallion.newsDailyCounts(silverNews)
    assert(counts.filter(col("article_count") === 2).count() == 1)
    val kw = Medallion.keywordDailyCounts(silverNews)
    assert(kw.filter(col("keyword") === "energy")
      .select("keyword_count").as[Long].collect().head == 2L)

    val silverQuotes = Seq(
      (1704412800000L, 100.0, 1e6, 0.4, 0.0, "XOM"),
      (1704412860000L, 102.0, 2e6, 0.5, 0.1, "XOM"))
      .toDF("update_timestamp", "price", "volume", "volatility",
        "market_sentiment", "company")
      .withColumn("bid_ask_spread", lit(0.1))
      .withColumn("trading_activity", lit(50.0))
    val gold = Medallion.quotesDailyGold(silverQuotes).collect().head
    assert(gold.getAs[Double]("avg_price") == 101.0)
    assert(gold.getAs[Double]("max_price") == 102.0)
  }

  test("partitioned write produces prunable layout") {
    val dir = tmpDir("gold") + "/t"
    val df = Seq(("2024-01-05", "XOM", 1.0), ("2024-01-06", "BP", 2.0))
      .toDF("aggregation_date", "company", "v")
    Medallion.writePartitioned(df, dir, Seq("aggregation_date"))
    assert(new java.io.File(dir).list()
      .exists(_.startsWith("aggregation_date=")))
    val back = spark.read.parquet(dir)
      .filter(col("aggregation_date") === "2024-01-05")
    assert(back.count() == 1)
  }

  test("multimodal extractFeatures: stable features, corrupt rows flagged") {
    val media = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "image", "somebytes".getBytes, 10, 10, null),
        Row(2L, "image", Array.empty[Byte], 0, 0, null),
        Row(3L, "audio", "other payload".getBytes, null, null, 1000L)),
      Multimodal.mediaSchema)
    val out = Multimodal.extractFeatures(media, dim = 8)
    val rows = out.orderBy("media_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Boolean]("decode_ok"))
    assert(!rows(1).getAs[Boolean]("decode_ok") && rows(1).isNullAt(4))
    assert(rows(2).getSeq[Float](4).size == 8)
    // determinism: same payload → same feature
    val again = Multimodal.extractFeatures(media, dim = 8)
      .orderBy("media_id").collect()
    assert(rows(0).getSeq[Float](4) == again(0).getSeq[Float](4))
  }

  // ---- real-codec fixtures, built byte-by-byte in the test ----

  /** Hand-built 3x2 uncompressed 24-bpp BMP (bottom-up, rows padded
    * 9 → 12 bytes). Pixel layout (top-down): row0 = R, G, B;
    * row1 = white, black, mid-gray(128). */
  private def bmpFixture: Array[Byte] = {
    val topDownBgr = Array[Int](
      0, 0, 255,   0, 255, 0,   255, 0, 0,     // red, green, blue (BGR!)
      255, 255, 255,   0, 0, 0,   128, 128, 128)
      .map(_.toByte)
    Multimodal.encodeBmp24(3, 2, topDownBgr)
  }

  /** Hand-built mono 16-bit PCM WAV with 8 known samples. */
  private def wavFixture(samples: Seq[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  test("BMP payloads decode for real: known pixels, known features") {
    // luminance (Rec.601, /255): red .299, green .587, blue .114,
    // white 1.0, black 0.0, gray 128/255*... -> (.299+.587+.114)*128/255
    val expected = Seq(0.299f, 0.587f, 0.114f, 1.0f, 0.0f, 128f / 255f)
    val dec = Multimodal.decodeBmp(bmpFixture)
    assert(dec.isDefined)
    assert(dec.get.width == 3 && dec.get.height == 2)
    dec.get.luma.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-4f, s"luma $got != $want")
    }
    // through the Spark surface: dim=6 grid == per-pixel luminance
    val media = spark.createDataFrame(
      java.util.List.of(Row(1L, "image", bmpFixture, 3, 2, null)),
      Multimodal.mediaSchema)
    val row = Multimodal.extractFeatures(media, dim = 6).collect()(0)
    assert(row.getAs[Boolean]("decode_ok"))
    row.getSeq[Float](4).zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-4f)
    }
  }

  test("truncated BMP is corrupt (decode_ok=false), not silently stubbed") {
    val cut = bmpFixture.take(40) // valid magic, impossible body
    val media = spark.createDataFrame(
      java.util.List.of(Row(1L, "image", cut, 3, 2, null)),
      Multimodal.mediaSchema)
    val row = Multimodal.extractFeatures(media, dim = 4).collect()(0)
    assert(!row.getAs[Boolean]("decode_ok") && row.isNullAt(4))
  }

  test("PNG round-trips: encode then decode returns identical pixels") {
    val rng = new scala.util.Random(5)
    val (w, h) = (7, 5) // odd width exercises non-aligned strides
    val rgb = Array.fill[Byte](w * h * 3)(rng.nextInt().toByte)
    val png = Multimodal.encodePng(w, h, rgb)
    val dec = Multimodal.decodePngRgb(png)
    assert(dec.isDefined)
    assert(dec.get._1 == w && dec.get._2 == h)
    assert(dec.get._3.toSeq == rgb.toSeq)
  }

  test("PNG filter reconstruction: all five filter types round-trip") {
    // hand-build a PNG whose rows use filters 0..4 (encodePng only
    // emits 0, so this exercises the Sub/Up/Average/Paeth undo paths)
    val (w, h) = (4, 5)
    val rng = new scala.util.Random(11)
    val rgb = Array.fill[Byte](w * h * 3)(rng.nextInt().toByte)
    val stride = w * 3
    def px(y: Int, x: Int) = if (y < 0 || x < 0) 0 else rgb(y * stride + x) & 0xff
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val filter = y % 5
      raw(y * (stride + 1)) = filter.toByte
      for (x <- 0 until stride) {
        val cur = px(y, x)
        val a = if (x >= 3) px(y, x - 3) else 0
        val up = px(y - 1, x)
        val ul = if (x >= 3) px(y - 1, x - 3) else 0
        val predicted = filter match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case 4 =>
            val p = a + up - ul
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) up else ul
        }
        raw(y * (stride + 1) + 1 + x) = (cur - predicted).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) z.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      def be(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)
      out.write(be(data.length), 0, 4)
      out.write(tpe.getBytes("US-ASCII"), 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tpe.getBytes("US-ASCII")); crc.update(data)
      out.write(be(crc.getValue.toInt), 0, 4)
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte)
      .put(0.toByte).array())
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    val dec = Multimodal.decodePngRgb(out.toByteArray)
    assert(dec.isDefined, "filtered PNG must decode")
    assert(dec.get._3.toSeq == rgb.toSeq,
      "filter reconstruction must recover the original pixels")
  }

  test("PNG payloads flow through extractFeatures and resizeImages") {
    // 2x2: white, black / black, white → luma grid [1,0,0,1]
    val rgb = Array[Int](255, 255, 255, 0, 0, 0, 0, 0, 0, 255, 255, 255)
      .map(_.toByte)
    val png = Multimodal.encodePng(2, 2, rgb)
    val media = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "image", png, 2, 2, null),
        Row(2L, "image", png.take(30), 2, 2, null)), // truncated: corrupt
      Multimodal.mediaSchema)
    val rows = Multimodal.extractFeatures(media, dim = 4)
      .orderBy("media_id").collect()
    assert(rows(0).getAs[Boolean]("decode_ok"))
    val f = rows(0).getSeq[Float](4)
    assert(math.abs(f(0) - 1.0f) < 1e-4f && math.abs(f(1)) < 1e-4f)
    assert(math.abs(f(2)) < 1e-4f && math.abs(f(3) - 1.0f) < 1e-4f)
    assert(!rows(1).getAs[Boolean]("decode_ok"),
      "truncated PNG must flag corrupt, not stub")
    // resize 2x2 → 1x1 (nearest-neighbor picks top-left = white), PNG out
    val r = Multimodal.resizeImages(
      media.filter(col("media_id") === 1L), 1, 1).collect()(0)
    assert(r.getInt(1) == 1 && r.getInt(2) == 1)
    val back = Multimodal.decodePngRgb(r.getAs[Array[Byte]](3))
    assert(back.isDefined && back.get._1 == 1 && back.get._2 == 1)
    assert((back.get._3(0) & 0xff) == 255)
  }

  test("WAV PCM payloads decode for real: windowed RMS of known samples") {
    // 8 samples; dim=4 -> RMS over pairs
    val s = Seq[Short](16384, -16384, 0, 0, 32767, 32767, -8192, 8192)
    val wav = wavFixture(s)
    val dec = Multimodal.decodeWav(wav)
    assert(dec.isDefined && dec.get.sampleRate == 8000)
    assert(dec.get.samples.length == 8)
    assert(math.abs(dec.get.samples(0) - 0.5f) < 1e-4f)
    val media = spark.createDataFrame(
      java.util.List.of(Row(9L, "audio", wav, null, null, 1L)),
      Multimodal.mediaSchema)
    val feat = Multimodal.extractFeatures(media, dim = 4).collect()(0)
    assert(feat.getAs[Boolean]("decode_ok"))
    val f = feat.getSeq[Float](4)
    assert(math.abs(f(0) - 0.5f) < 1e-4f)       // rms(.5, -.5)
    assert(math.abs(f(1) - 0.0f) < 1e-4f)       // rms(0, 0)
    assert(math.abs(f(2) - 32767f / 32768f) < 1e-4f)
    assert(math.abs(f(3) - 0.25f) < 1e-3f)      // rms(-.25, .25)
  }

  test("resizeImages really resamples BMP payloads to the fit box") {
    val media = spark.createDataFrame(
      java.util.List.of(Row(1L, "image", bmpFixture, 3, 2, null)),
      Multimodal.mediaSchema)
    // box 2x2 -> scale = min(2/3, 1, 1) = 2/3 -> out 2x1
    val out = Multimodal.resizeImages(media, 2, 2).collect()(0)
    assert(out.getInt(1) == 2 && out.getInt(2) == 1)
    val resized = Multimodal.decodeBmp(out.getAs[Array[Byte]](3))
    assert(resized.isDefined, "resized payload must be a decodable BMP")
    assert(resized.get.width == 2 && resized.get.height == 1)
    // nearest-neighbor from 3x2 to 2x1: sy=0; sx = 0, 1 -> red, green
    val expect = Seq(0.299f, 0.587f)
    resized.get.luma.zip(expect).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-4f)
    }
  }

  test("resizeImages computes aspect-preserving fit, never upscales") {
    val media = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "image", "img".getBytes, 4000, 2000, null),
        Row(2L, "image", "img".getBytes, 100, 50, null),
        Row(3L, "audio", "aud".getBytes, null, null, 1000L)),
      Multimodal.mediaSchema)
    val out = Multimodal.resizeImages(media, 1024, 1024)
      .orderBy("media_id").collect()
    assert(out.length == 2) // audio filtered out
    assert(out(0).getInt(1) == 1024 && out(0).getInt(2) == 512)
    assert(out(1).getInt(1) == 100 && out(1).getInt(2) == 50) // no upscale
  }

  test("sampleFrames explodes frame indices without payload bytes downstream") {
    val media = spark.createDataFrame(
      java.util.List.of(Row(7L, "video", "vid".getBytes, null, null, 2500L)),
      Multimodal.mediaSchema)
    val out = Multimodal.sampleFrames(media, 1000L)
    assert(out.select("frame_ms").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1000L, 2000L))
    assert(!out.columns.contains("payload"))
  }

  test("payloadNearDups finds re-encoded blobs without decoding") {
    val rng = new scala.util.Random(42)
    val blob = Array.fill[Byte](4096)(rng.nextInt().toByte)
    val nearDup = blob.clone(); nearDup(100) = (nearDup(100) ^ 0x7f).toByte
    val unrelated = Array.fill[Byte](4096)(rng.nextInt().toByte)
    val media = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "image", blob, null, null, null),
        Row(2L, "image", nearDup, null, null, null),      // 1 chunk differs
        Row(3L, "image", unrelated, null, null, null),
        Row(4L, "image", Array.empty[Byte], null, null, null)),
      Multimodal.mediaSchema)
    val sigs = Multimodal.payloadSimhash(media).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(sigs(4L).isEmpty, "empty payload -> null signature")
    assert(sigs(1L) != sigs(3L))
    val pairs = Multimodal.payloadNearDups(media, maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"near-dup pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated blob must not pair: $pairs")
  }

  test("imageDhash: re-encoding invariant, noise-tolerant, edit-sensitive") {
    // a 36x24 smooth two-axis gradient: distinct cell means, so dHash
    // comparisons are far from float ties
    val w = 36; val h = 24
    def lum(x: Int, y: Int): Int = (x * 5 + y * 3) % 256
    val rgb = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; lum(p % w, p / w).toByte
    }
    val bgr = rgb.clone() // grayscale: R=G=B, channel order irrelevant
    val bmp = Multimodal.encodeBmp24(w, h, bgr)
    val png = Multimodal.encodePng(w, h, rgb)
    // same pixels, different container: byte simhash differs, dHash equal
    val noisy = rgb.clone()
    var i = 0
    while (i < noisy.length) { // ±2 luma jitter on every pixel
      noisy(i) = math.max(0, math.min(255,
        (noisy(i) & 0xff) + (i % 5) - 2)).toByte
      i += 1
    }
    val flipped = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; lum(w - 1 - p % w, p / w).toByte // mirror = different image
    }
    val media = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "image", bmp, null, null, null),
        Row(2L, "image", png, null, null, null),
        Row(3L, "image", Multimodal.encodePng(w, h, noisy), null, null, null),
        Row(4L, "image", Multimodal.encodePng(w, h, flipped), null, null, null),
        Row(5L, "image", "not an image".getBytes, null, null, null)),
      Multimodal.mediaSchema)
    val sig = Multimodal.imageDhash(media).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(sig(5L).isEmpty, "undecodable payload -> null dHash")
    assert(sig(1L) == sig(2L),
      "same pixels as BMP and PNG must hash identically")
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L).get, sig(3L).get) <= 8,
      s"jittered copy too far: ${ham(sig(1L).get, sig(3L).get)}")
    assert(ham(sig(1L).get, sig(4L).get) > 16,
      s"mirrored image too close: ${ham(sig(1L).get, sig(4L).get)}")
    // and the byte-level simhash CANNOT see the BMP==PNG equivalence
    val bytes = Multimodal.payloadSimhash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ham(bytes(1L), bytes(2L)) > 6,
      "byte simhash should differ across containers (else dHash is redundant)")
    // banded near-dup: {1,2,3} cluster, mirror and garbage excluded
    val pairs = Multimodal.imageNearDups(media, maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)),
      s"expected re-encode+noise pairs, got $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"mirror must not pair: $pairs")
  }

  test("imageDhash survives nearest-neighbor downscale (the dedup case)") {
    val w = 72; val h = 48
    def lum(x: Int, y: Int): Int = (x * 3 + y * 2) % 256
    val rgb = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; lum(p % w, p / w).toByte
    }
    val big = Multimodal.encodeBmp24(w, h, rgb)
    val media = spark.createDataFrame(
      java.util.List.of(Row(1L, "image", big, 0, 0, null)),
      StructType(Seq(StructField("media_id", LongType),
        StructField("media_type", StringType),
        StructField("payload", BinaryType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("duration_ms", LongType))))
      .withColumn("width", lit(w)).withColumn("height", lit(h))
    val small = Multimodal.resizeImages(media, w / 2, h / 2)
      .select(col("media_id"), col("out_payload").as("payload"))
    val sigBig = Multimodal.imageDhash(media).collect().head.getLong(1)
    val sigSmall = Multimodal.imageDhash(small).collect().head.getLong(1)
    val d = java.lang.Long.bitCount(sigBig ^ sigSmall)
    assert(d <= 8, s"downscaled copy drifted $d bits")
  }

  test("audioFingerprints: volume-invariant, edit-sensitive, banded dedup") {
    // 65 windows x 10 samples, each window a +/-a square wave so its
    // RMS is exactly a/32768 — amplitudes from a seeded LCG keep
    // neighboring windows clearly apart (no float ties to flip)
    var seed = 987654321L
    def nextAmp(): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      2000 + 2 * (math.abs(seed >>> 33).toInt % 14000) // even, in [2000, 30000)
    }
    val amps = Array.fill(65)(nextAmp())
    def square(a: Array[Int]): Seq[Short] =
      a.toSeq.flatMap(amp => Seq.fill(5)(Seq(amp.toShort,
        (-amp).toShort)).flatten)
    val base = wavFixture(square(amps))
    // re-leveled copy: every sample halved (amplitudes even -> exact)
    val releveled = wavFixture(square(amps.map(_ / 2)))
    val other = wavFixture(square(Array.fill(65)(nextAmp())))
    val media = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "audio", base, null, null, null),
        Row(2L, "audio", releveled, null, null, null),
        Row(3L, "audio", other, null, null, null),
        Row(4L, "audio", "not audio".getBytes, null, null, null)),
      Multimodal.mediaSchema)
    val sig = Multimodal.audioFingerprints(media).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(sig(4L).isEmpty, "undecodable payload -> null fingerprint")
    assert(sig(1L) == sig(2L),
      "volume scaling must not move a single energy-delta bit")
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L).get, sig(3L).get) > 16,
      s"unrelated waveform too close: ${ham(sig(1L).get, sig(3L).get)}")
    // banded near-dup surface: the re-leveled pair, nothing else
    val pairs = Multimodal.audioNearDups(media, maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"expected only the re-leveled pair: $pairs")
  }

  test("probeVideoMeta parses real MP4 box trees; malformed inputs -> probe_ok=false") {
    def be(buf: java.nio.ByteBuffer): java.nio.ByteBuffer = buf
    def fullMp4(timescale: Int, duration: Int, w: Int, h: Int): Array[Byte] = {
      val ftyp = java.nio.ByteBuffer.allocate(16)
      ftyp.putInt(16).put("ftyp".getBytes("US-ASCII"))
        .put("isom".getBytes("US-ASCII")).putInt(0)
      val mvhd = java.nio.ByteBuffer.allocate(108)
      mvhd.putInt(108).put("mvhd".getBytes("US-ASCII"))
        .putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // creation, modification
        .putInt(timescale).putInt(duration)
        .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
        .putLong(0) // rate, volume, reserved
      (0 until 9).foreach(_ => mvhd.putInt(0)) // matrix
      (0 until 6).foreach(_ => mvhd.putInt(0)) // predefined
      mvhd.putInt(2) // next track id
      val tkhd = java.nio.ByteBuffer.allocate(92)
      tkhd.putInt(92).put("tkhd".getBytes("US-ASCII"))
        .putInt(0) // version 0 + flags
        .putInt(0).putInt(0).putInt(1).putInt(0).putInt(duration)
        .putLong(0) // reserved
        .putShort(0).putShort(0).putShort(0).putShort(0)
      (0 until 9).foreach(_ => tkhd.putInt(0)) // matrix
      tkhd.putInt(w << 16).putInt(h << 16) // 16.16 fixed point
      val trak = java.nio.ByteBuffer.allocate(100)
      trak.putInt(100).put("trak".getBytes("US-ASCII")).put(tkhd.array())
      val moov = java.nio.ByteBuffer.allocate(216)
      moov.putInt(216).put("moov".getBytes("US-ASCII"))
        .put(mvhd.array()).put(trak.array())
      val out = java.nio.ByteBuffer.allocate(16 + 216)
      be(out).put(ftyp.array()).put(moov.array())
      out.array()
    }
    val good = fullMp4(timescale = 600, duration = 1500, w = 320, h = 240)
    assert(Multimodal.probeMp4(good).contains(
      Multimodal.Mp4Meta(2500L, 320, 240)))
    // hardening: truncation, size overflow, zero timescale, non-MP4
    assert(Multimodal.probeMp4(good.take(40)).isEmpty)
    val oversize = good.clone()
    oversize(16) = 0x7f.toByte // moov box claims 2 GB
    assert(Multimodal.probeMp4(oversize).isEmpty)
    assert(Multimodal.probeMp4(
      fullMp4(timescale = 0, duration = 1500, w = 320, h = 240)).isEmpty)
    assert(Multimodal.probeMp4("actually text".getBytes).isEmpty)
    // trailing truncation after moov (moov-first progressive file with a
    // cut-short mdat) must NOT void already-parsed metadata
    val cutMdat = java.nio.ByteBuffer.allocate(good.length + 12)
    cutMdat.put(good).putInt(5000).put("mdat".getBytes("US-ASCII"))
      .putInt(0) // claims 5000 bytes, only 4 present
    assert(Multimodal.probeMp4(cutMdat.array()).contains(
      Multimodal.Mp4Meta(2500L, 320, 240)),
      "truncated trailing box after moov must not discard metadata")
    // v1 (64-bit) mvhd: sane duration parses; an attacker-sized duration
    // that would overflow dur*1000 is rejected, not wrapped into garbage
    def v1Mp4(duration: Long): Array[Byte] = {
      val mvhd = java.nio.ByteBuffer.allocate(48)
      mvhd.putInt(48).put("mvhd".getBytes("US-ASCII"))
        .put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1 + flags
        .putLong(0).putLong(0) // creation, modification (64-bit)
        .putInt(600).putLong(duration).putInt(0)
      val moov = java.nio.ByteBuffer.allocate(56)
      moov.putInt(56).put("moov".getBytes("US-ASCII")).put(mvhd.array())
      val ftyp = java.nio.ByteBuffer.allocate(16)
      ftyp.putInt(16).put("ftyp".getBytes("US-ASCII"))
        .put("isom".getBytes("US-ASCII")).putInt(0)
      val out = java.nio.ByteBuffer.allocate(16 + 56)
      out.put(ftyp.array()).put(moov.array())
      out.array()
    }
    assert(Multimodal.probeMp4(v1Mp4(3000L)).contains(
      Multimodal.Mp4Meta(5000L, 0, 0)), "64-bit mvhd path")
    assert(Multimodal.probeMp4(v1Mp4(Long.MaxValue / 2)).isEmpty,
      "overflow-sized mvhd duration must be rejected")
    // the Spark surface: probe_ok + typed metadata columns
    val media = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "video", good, null, null, null),
        Row(2L, "video", "junk".getBytes, null, null, null)),
      Multimodal.mediaSchema)
    val out = Multimodal.probeVideoMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(1) && out(1L).getLong(2) == 2500L &&
      out(1L).getInt(3) == 320 && out(1L).getInt(4) == 240)
    assert(!out(2L).getBoolean(1) && out(2L).isNullAt(2))
  }

  test("probeMp3 walks real frame headers; malformed inputs -> probe_ok=false") {
    // MPEG1 Layer III 44100 Hz: header FF FB <bitrateIdx<<4 | rateIdx<<2
    // | pad<<1> 00, frame length = 144*bitrate/rate + pad
    def frame(kbps: Int, pad: Int = 0): Array[Byte] = {
      val idx = Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
        224, 256, 320).indexOf(kbps)
      assert(idx > 0, s"not a MPEG1-L3 bitrate: $kbps")
      val len = 144 * kbps * 1000 / 44100 + pad
      val f = Array.fill[Byte](len)(0x11)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte
      f(2) = ((idx << 4) | (pad << 1)).toByte; f(3) = 0x00
      f
    }
    val cbr10 = Array.fill(10)(frame(128)).flatten
    // 10 frames x 1152 samples / 44100 Hz = 261.2 ms
    assert(Multimodal.probeMp3(cbr10).contains(
      Multimodal.Mp3Meta(261L, 44100, 128, 10L, vbr = false)))
    // padding bit lengthens the frame by one slot — walk must follow it
    val padded = (frame(128, pad = 1) ++ frame(128)) :+ 0x00.toByte
    assert(Multimodal.probeMp3(padded).exists(_.nFrames == 2L))
    // ID3v2 preamble (10-byte header + syncsafe-sized tag) is skipped
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 20) ++
      Array.fill[Byte](20)(0x41) ++ cbr10
    assert(Multimodal.probeMp3(id3).contains(
      Multimodal.Mp3Meta(261L, 44100, 128, 10L, vbr = false)))
    // VBR: frame-weighted mean bitrate, vbr flagged
    val vbr = (Array.fill(5)(frame(128)) ++ Array.fill(5)(frame(192))).flatten
    assert(Multimodal.probeMp3(vbr).contains(
      Multimodal.Mp3Meta(261L, 44100, 160, 10L, vbr = true)))
    // truncated trailing frame must not void frames already parsed
    val cut = cbr10 ++ frame(128).take(100)
    assert(Multimodal.probeMp3(cut).exists(m =>
      m.nFrames == 10L && m.durationMs == 261L),
      "truncated trailing frame must keep parsed metadata")
    // hardening: non-audio, bad bitrate index, free-format, reserved
    // version, oversized ID3 length — all None, never garbage
    assert(Multimodal.probeMp3("not audio at all".getBytes).isEmpty)
    assert(Multimodal.probeMp3(null).isEmpty)
    val badIdx = frame(128); badIdx(2) = 0xf0.toByte // bitrate index 15
    assert(Multimodal.probeMp3(badIdx).isEmpty)
    val free = frame(128); free(2) = 0x00 // free-format: length unknowable
    assert(Multimodal.probeMp3(free).isEmpty)
    val reserved = frame(128); reserved(1) = 0xeb.toByte // version bits 01
    assert(Multimodal.probeMp3(reserved).isEmpty)
    val hugeId3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f)
    assert(Multimodal.probeMp3(hugeId3).isEmpty)
    // MPEG2 Layer III (FF F3): 576 samples/frame at 22050 Hz
    val m2 = {
      val len = 72 * 64 * 1000 / 22050 // idx 8 = 64 kbps
      val f = Array.fill[Byte](len)(0x22)
      f(0) = 0xff.toByte; f(1) = 0xf3.toByte; f(2) = 0x80.toByte; f(3) = 0
      f
    }
    assert(Multimodal.probeMp3(m2).contains(
      Multimodal.Mp3Meta(26L, 22050, 64, 1L, vbr = false)))
    // the Spark surface: probe_ok + typed metadata columns
    val media = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "audio", cbr10, null, null, null),
        Row(2L, "audio", "junk".getBytes, null, null, null)),
      Multimodal.mediaSchema)
    val out = Multimodal.probeAudioMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(1) && out(1L).getLong(2) == 261L &&
      out(1L).getInt(3) == 44100 && out(1L).getInt(4) == 128 &&
      out(1L).getLong(5) == 10L && !out(1L).getBoolean(6))
    assert(!out(2L).getBoolean(1) && out(2L).isNullAt(2))
  }

  test("probeMp3 never throws or reports garbage on fuzzed inputs") {
    val rnd = new scala.util.Random(7)
    // pure noise: must never throw; if a frame parses by chance the
    // metadata must still be internally consistent
    (0 until 300).foreach { i =>
      val b = Array.fill[Byte](rnd.nextInt(400))(rnd.nextInt(256).toByte)
      Multimodal.probeMp3(b).foreach { m =>
        assert(m.durationMs >= 0 && m.nFrames > 0 && m.sampleRateHz > 0 &&
          m.bitrateKbps > 0, s"inconsistent meta from noise #$i: $m")
      }
    }
    // every truncation prefix of a valid stream: no throw, and any
    // successful probe reports only whole frames actually present
    val frame128 = {
      val len = 144 * 128 * 1000 / 44100
      val f = Array.fill[Byte](len)(0x33)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte; f(2) = 0x90.toByte; f(3) = 0
      f
    }
    val full = Array.fill(4)(frame128).flatten
    (0 to full.length).foreach { n =>
      Multimodal.probeMp3(full.take(n)).foreach { m =>
        assert(m.nFrames == n / frame128.length,
          s"prefix $n reported ${m.nFrames} frames")
      }
    }
    // bit-flip fuzz over a valid stream: header corruption must stop
    // the walk (fewer frames) or leave consistent metadata, never throw
    (0 until 200).foreach { i =>
      val b = full.clone()
      val pos = rnd.nextInt(b.length)
      b(pos) = (b(pos) ^ (1 << rnd.nextInt(8))).toByte
      Multimodal.probeMp3(b).foreach { m =>
        assert(m.nFrames >= 1 && m.nFrames <= 4 && m.durationMs >= 0,
          s"bit-flip at $pos gave $m")
      }
    }
  }

  test("sampleFrames skips zero/null-duration videos instead of failing") {
    val media = spark.createDataFrame(
      java.util.List.of(
        Row(1L, "video", "v1".getBytes, null, null, 0L),
        Row(2L, "video", "v2".getBytes, null, null, null),
        Row(3L, "video", "v3".getBytes, null, null, 1500L)),
      Multimodal.mediaSchema)
    val out = Multimodal.sampleFrames(media, 1000L).collect()
    assert(out.map(_.getLong(0)).toSet == Set(3L))
  }

  // ---- VAD ----

  test("vadSegments: exact frame bounds, gap bridging, non-audio silent") {
    // 8 kHz, 20 ms frames = 160 samples each. Layout (frames):
    // 0-9 silence | 10-19 tone | 20-22 silence (gap 3) | 23-27 tone
    val silence = Seq.fill(160)(0.toShort)
    val tone = Seq.tabulate(160)(i =>
      (if (i % 2 == 0) 10000 else -10000).toShort)
    val samples = Seq.fill(10)(silence).flatten ++
      Seq.fill(10)(tone).flatten ++
      Seq.fill(3)(silence).flatten ++
      Seq.fill(5)(tone).flatten
    val media = spark.createDataFrame(
      java.util.List.of(
        Row(1L, wavFixture(samples)),
        Row(2L, "not audio".getBytes)),
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload", BinaryType))))
    // default minGapFrames = 2 < gap 3 -> two segments
    val segs = Multimodal.vadSegments(media)
      .orderBy(col("seg_start_ms")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(segs.toSeq == Seq(
      (1L, 200L, 400L, 10), (1L, 460L, 560L, 5)))
    // minGapFrames = 3 bridges the pause -> one utterance
    val merged = Multimodal.vadSegments(media, minGapFrames = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(merged.toSeq == Seq((200L, 560L, 18)))
    // RMS of the +/-10000 square is exactly 10000/32768
    val rms = Multimodal.vadSegments(media).collect()
      .map(_.getDouble(4))
    rms.foreach(v => assert(math.abs(v - 10000.0 / 32768.0) < 1e-6))
  }

  test("vadSegments: a loud sub-frame clip still yields a segment") {
    // 150 samples at 8 kHz < one 20 ms frame (160): the trailing
    // partial frame must count (a floor division dropped it entirely)
    val clip = Seq.tabulate(150)(i =>
      (if (i % 2 == 0) 12000 else -12000).toShort)
    val media = spark.createDataFrame(
      java.util.List.of(Row(1L, wavFixture(clip))),
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload", BinaryType))))
    val segs = Multimodal.vadSegments(media).collect()
    assert(segs.length == 1)
    assert(segs.head.getInt(3) == 1) // one (partial) frame
    assert(math.abs(segs.head.getDouble(4) - 12000.0 / 32768.0) < 1e-6)
    // seg_end clamps to the decoded duration (ceil(150/8000*1000) =
    // 19 ms), not the 20 ms frame-grid end
    assert(segs.head.getLong(2) == 19L)
  }

  // ---- TIFF prober ----

  /** Minimal TIFF: header + one IFD with (tag, SHORT/LONG, value)
    * entries, in either byte order. */
  private def tiffBytes(le: Boolean,
      entries: Seq[(Int, Int, Long)]): Array[Byte] = {
    val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    def w16(v: Int): Unit =
      if (le) { buf += (v & 0xff).toByte; buf += ((v >> 8) & 0xff).toByte }
      else { buf += ((v >> 8) & 0xff).toByte; buf += (v & 0xff).toByte }
    def w32(v: Long): Unit =
      if (le) (0 to 3).foreach(i => buf += ((v >> (8 * i)) & 0xff).toByte)
      else (3 to 0 by -1).foreach(i => buf += ((v >> (8 * i)) & 0xff).toByte)
    if (le) { buf += 'I'; buf += 'I' } else { buf += 'M'; buf += 'M' }
    w16(42)
    w32(8L) // IFD0 right after the header
    w16(entries.size)
    entries.foreach { case (tag, typ, v) =>
      w16(tag); w16(typ); w32(1L)
      if (typ == 3) { w16(v.toInt); w16(0) } else w32(v)
    }
    w32(0L) // no next IFD
    buf.toArray
  }

  test("probeTiff reads IFD0 in both byte orders; orientation defaults") {
    val le = Multimodal.probeTiff(tiffBytes(le = true,
      Seq((256, 3, 640L), (257, 4, 480L), (274, 3, 6L)))).get
    assert(le.width == 640L && le.height == 480L && le.orientation == 6)
    val be = Multimodal.probeTiff(tiffBytes(le = false,
      Seq((256, 4, 1920L), (257, 3, 1080L)))).get
    assert(be.width == 1920L && be.height == 1080L && be.orientation == 1)
    assert(be.nEntries == 2)
  }

  test("probeTiff hardening: truncation, bad magic, missing dims, fuzz") {
    val good = tiffBytes(le = true,
      Seq((256, 3, 64L), (257, 3, 32L), (274, 3, 3L)))
    // every truncation prefix either parses fully or returns None —
    // the directory ends at header(8) + count(2) + 3x12 entries; the
    // 4-byte next-IFD pointer past it is never read, so prefixes
    // missing only that tail still parse
    val dirEnd = 8 + 2 + 3 * 12
    (0 until good.length).foreach { n =>
      val t = Multimodal.probeTiff(good.take(n))
      assert(if (n < dirEnd) t.isEmpty else t.nonEmpty)
    }
    // bad magic / endian tag
    val bad = good.clone(); bad(2) = 41
    assert(Multimodal.probeTiff(bad).isEmpty)
    // width present, height absent -> reject
    assert(Multimodal.probeTiff(tiffBytes(le = true,
      Seq((256, 3, 64L)))).isEmpty)
    // offset-typed (non-inline) dims are not trusted
    assert(Multimodal.probeTiff(tiffBytes(le = true,
      Seq((256, 5, 64L), (257, 5, 32L)))).isEmpty)
    // bit-flip fuzz never throws
    val rnd = new scala.util.Random(23)
    (1 to 300).foreach { _ =>
      val f = good.clone()
      f(rnd.nextInt(f.length)) = rnd.nextInt(256).toByte
      Multimodal.probeTiff(f) // must not throw
    }
  }

  test("probeTiffMeta DataFrame wrapper: ok and not-ok rows") {
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, tiffBytes(le = true, Seq((256, 3, 10L), (257, 3, 20L)))),
        Row(2L, "notatiff".getBytes),
        Row(3L, null))),
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload", BinaryType))))
    val out = Multimodal.probeTiffMeta(media).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
    val ok = Multimodal.probeTiffMeta(media)
      .filter(col("probe_ok")).collect().head
    assert(ok.getAs[Long]("width") == 10L &&
      ok.getAs[Long]("height") == 20L &&
      ok.getAs[Int]("orientation") == 1)
  }

  // ---- EXIF prober (round 12) ----

  /** Byte-built EXIF TIFF (either byte order): IFD0 with Make
    * (offset ASCII), Model (inline ASCII), Orientation, DateTime,
    * and an Exif sub-IFD holding DateTimeOriginal; optionally
    * wrapped in a JPEG APP1 segment. */
  private def exifPayload(le: Boolean, asJpeg: Boolean): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(256).order(
      if (le) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    def entryHead(tag: Int, typ: Int, cnt: Int): Unit = {
      bb.putShort(tag.toShort); bb.putShort(typ.toShort); bb.putInt(cnt)
    }
    val make = "GraftCam "
    val dt = "2024:01:02 03:04:05 "
    val dto = "2023:12:31 23:59:58 "
    val makeOff = 8 + 2 + 5 * 12 + 4
    val dtOff = makeOff + make.length
    val subOff = dtOff + dt.length
    val dtoOff = subOff + 2 + 12 + 4
    bb.put((if (le) "II" else "MM").getBytes("US-ASCII"))
    bb.putShort(42); bb.putInt(8)
    bb.putShort(5)
    entryHead(271, 2, make.length); bb.putInt(makeOff)
    entryHead(272, 2, 3) // inline ASCII: raw bytes, no endianness
    bb.put('X'.toByte); bb.put('1'.toByte); bb.put(0.toByte); bb.put(0.toByte)
    entryHead(274, 3, 1); bb.putShort(6); bb.putShort(0)
    entryHead(306, 2, dt.length); bb.putInt(dtOff)
    entryHead(34665, 4, 1); bb.putInt(subOff)
    bb.putInt(0) // next IFD
    bb.put(make.getBytes("US-ASCII"))
    bb.put(dt.getBytes("US-ASCII"))
    bb.putShort(1)
    entryHead(36867, 2, dto.length); bb.putInt(dtoOff)
    bb.putInt(0)
    bb.put(dto.getBytes("US-ASCII"))
    val tiff = java.util.Arrays.copyOf(bb.array(), bb.position())
    if (!asJpeg) tiff
    else {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(0xff); bos.write(0xd8) // SOI
      // a decoy APP0 first: the scan must skip past it
      bos.write(0xff); bos.write(0xe0); bos.write(0); bos.write(4)
      bos.write('J'); bos.write('F')
      val len = 2 + 6 + tiff.length
      bos.write(0xff); bos.write(0xe1)
      bos.write((len >> 8) & 0xff); bos.write(len & 0xff)
      bos.write("Exif".getBytes("US-ASCII")); bos.write(0); bos.write(0)
      bos.write(tiff)
      bos.write(0xff); bos.write(0xd9) // EOI
      bos.toByteArray
    }
  }

  test("probeExif: IFD0 + Exif sub-IFD, both byte orders, JPEG + TIFF") {
    for (le <- Seq(true, false); jpeg <- Seq(true, false)) {
      val m = Multimodal.probeExif(exifPayload(le, jpeg))
        .getOrElse(fail(s"le=$le jpeg=$jpeg did not probe"))
      assert(m.orientation == 6, s"le=$le jpeg=$jpeg")
      assert(m.make == "GraftCam" && m.model == "X1")
      assert(m.dateTime == "2024:01:02 03:04:05")
      assert(m.dateTimeOriginal == "2023:12:31 23:59:58")
    }
    // plain JPEG without APP1 (or with SOS first) has no EXIF
    assert(Multimodal.probeExif(Array(0xff, 0xd8, 0xff, 0xda, 0, 4,
      1, 2).map(_.toByte)).isEmpty)
    assert(Multimodal.probeExif("not an image".getBytes).isEmpty)
    assert(Multimodal.probeExif(null).isEmpty)
  }

  test("probeExif hardening: truncation sweep + fuzz never throw") {
    val good = exifPayload(le = true, asJpeg = true)
    (0 until good.length).foreach { k =>
      Multimodal.probeExif(good.take(k)) // must not throw
    }
    val rnd = new scala.util.Random(47)
    (1 to 400).foreach { _ =>
      val f = good.clone()
      f(rnd.nextInt(f.length)) = rnd.nextInt(256).toByte
      Multimodal.probeExif(f) // must not throw
    }
  }

  test("probeExifMeta DataFrame face: ok, partial and not-ok rows") {
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, exifPayload(le = true, asJpeg = true)),
        Row(2L, "plain".getBytes),
        Row(3L, null))),
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload", BinaryType))))
    val out = Multimodal.probeExifMeta(media).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1),
        if (r.isNullAt(4)) null else r.getString(4))).toMap
    assert(out(1L) == ((true, "X1")))
    assert(out(2L) == ((false, null)) && out(3L) == ((false, null)))
  }

  // ---- PDF prober ----

  /** Minimal classic-xref PDF: catalog + pages + nPages page objects,
    * 20-byte xref entries with real offsets, trailer, startxref. */
  private def pdfClassic(nPages: Int, encrypted: Boolean = false,
      version: String = "1.4"): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(s"%PDF-$version\n")
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    offs += sb.length
    sb.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until nPages).map(i => s"${3 + i} 0 R").mkString(" ")
    offs += sb.length
    sb.append(s"2 0 obj\n<< /Type /Pages /Kids [$kids] " +
      s"/Count $nPages >>\nendobj\n")
    (0 until nPages).foreach { i =>
      offs += sb.length
      sb.append(s"${3 + i} 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n")
    }
    val xrefPos = sb.length
    val n = offs.length + 1
    sb.append(s"xref\n0 $n\n0000000000 65535 f \n")
    offs.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size $n /Root 1 0 R" +
      (if (encrypted) " /Encrypt 9 0 R" else "") +
      s" >>\nstartxref\n$xrefPos\n%%EOF")
    sb.toString.getBytes("US-ASCII")
  }

  /** PDF 1.5 cross-reference STREAM fixture: same object tree, xref
    * held in a FlateDecode stream with W [1 2 1], optionally behind
    * the PNG Up predictor (12). */
  private def pdfXrefStream(nPages: Int,
      predictor: Boolean): Array[Byte] = {
    val head = new StringBuilder
    head.append("%PDF-1.5\n")
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    offs += head.length
    head.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until nPages).map(i => s"${3 + i} 0 R").mkString(" ")
    offs += head.length
    head.append(s"2 0 obj\n<< /Type /Pages /Kids [$kids] " +
      s"/Count $nPages >>\nendobj\n")
    (0 until nPages).foreach { i =>
      offs += head.length
      head.append(s"${3 + i} 0 obj\n<< /Type /Page /Parent 2 0 R >>\n" +
        "endobj\n")
    }
    val xrefObjNum = 3 + nPages
    val xrefPos = head.length
    val size = xrefObjNum + 1
    // rows: free obj 0, type-1 rows for 1..(2+nPages), the stream itself
    val rowW = 4
    val rows = (Seq((0L, 0L)) ++ offs.map(o => (1L, o.toLong)) ++
      Seq((1L, xrefPos.toLong))).map { case (t, off) =>
      Array[Byte](t.toByte, ((off >> 8) & 0xff).toByte,
        (off & 0xff).toByte, 0.toByte)
    }
    val plain: Array[Byte] =
      if (!predictor) rows.flatten.toArray
      else {
        // PNG Up filter (2): first row literal (up = 0), each later
        // row stores delta to the row above; filter byte leads
        val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
        var prev = new Array[Byte](rowW)
        rows.foreach { r =>
          out += 2.toByte
          var i = 0
          while (i < rowW) {
            out += ((r(i) - prev(i)) & 0xff).toByte
            i += 1
          }
          prev = r
        }
        out.toArray
      }
    val defl = {
      val d = new java.util.zip.Deflater()
      d.setInput(plain); d.finish()
      val buf = new Array[Byte](4096)
      val bos = new java.io.ByteArrayOutputStream()
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      bos.toByteArray
    }
    val parms = if (predictor)
      s" /DecodeParms << /Predictor 12 /Columns $rowW >>" else ""
    val dict = s"$xrefObjNum 0 obj\n<< /Type /XRef /Size $size " +
      s"/Root 1 0 R /W [1 2 1] /Index [0 $size] /Filter /FlateDecode" +
      parms + s" /Length ${defl.length} >>\nstream\n"
    val tail = s"\nendstream\nendobj\nstartxref\n$xrefPos\n%%EOF"
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(head.toString.getBytes("US-ASCII"))
    bos.write(dict.getBytes("US-ASCII"))
    bos.write(defl)
    bos.write(tail.getBytes("US-ASCII"))
    bos.toByteArray
  }

  test("probePdf: classic xref table — version, size, pages, encrypt flag") {
    val m = Multimodal.probePdf(pdfClassic(3)).get
    assert(m.version == "1.4" && m.xrefType == "table")
    assert(m.nObjects == 6L) // catalog + pages + 3 pages + free obj 0
    assert(m.pageCount == 3L)
    assert(!m.encrypted)
    val enc = Multimodal.probePdf(pdfClassic(1, encrypted = true)).get
    assert(enc.encrypted && enc.pageCount == 1L)
    assert(Multimodal.probePdf(pdfClassic(7, version = "1.7")).get
      .version == "1.7")
  }

  test("probePdf: xref stream (FlateDecode), with and without PNG predictor") {
    Seq(false, true).foreach { pred =>
      val m = Multimodal.probePdf(pdfXrefStream(2, predictor = pred))
        .getOrElse(fail(s"predictor=$pred did not probe"))
      assert(m.xrefType == "stream", s"predictor=$pred")
      assert(m.version == "1.5" && m.nObjects == 6L)
      assert(m.pageCount == 2L, s"predictor=$pred got $m")
      assert(!m.encrypted)
    }
  }

  test("probePdf hardening: truncation, bad magic, fuzz never throws") {
    val good = pdfClassic(2)
    (0 until good.length).foreach { n =>
      Multimodal.probePdf(good.take(n)) // must not throw
    }
    // a prefix missing the trailer tail can never probe
    assert(Multimodal.probePdf(good.take(good.length / 2)).isEmpty)
    assert(Multimodal.probePdf("not a pdf at all".getBytes).isEmpty)
    assert(Multimodal.probePdf(null).isEmpty)
    val rnd = new scala.util.Random(29)
    (1 to 300).foreach { _ =>
      val f = good.clone()
      f(rnd.nextInt(f.length)) = rnd.nextInt(256).toByte
      Multimodal.probePdf(f) // must not throw
    }
    val gs = pdfXrefStream(2, predictor = true)
    (1 to 300).foreach { _ =>
      val f = gs.clone()
      f(rnd.nextInt(f.length)) = rnd.nextInt(256).toByte
      Multimodal.probePdf(f) // must not throw
    }
  }

  test("probePdfMeta DataFrame wrapper: ok and not-ok rows") {
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, pdfClassic(4)),
        Row(2L, "plain text".getBytes),
        Row(3L, null))),
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload", BinaryType))))
    val out = Multimodal.probePdfMeta(media).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
    val ok = Multimodal.probePdfMeta(media)
      .filter(col("probe_ok")).collect().head
    assert(ok.getAs[Long]("page_count") == 4L &&
      ok.getAs[String]("xref_type") == "table" &&
      !ok.getAs[Boolean]("encrypted"))
  }

  // ---- PDF text extraction (round 11) ----

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](4096)
    val bos = new java.io.ByteArrayOutputStream()
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

  /** Classic-xref PDF whose pages carry REAL /Contents streams —
    * optionally Flate-compressed, optionally with an indirect
    * /Length ref (the layout word processors emit). */
  private def pdfWithText(pages: Seq[String], flate: Boolean,
      indirectLen: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val n = pages.length
    w("%PDF-1.4\n")
    offs += bos.size
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    offs += bos.size
    w(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n")
    (0 until n).foreach { i =>
      offs += bos.size
      w(s"${3 + i} 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/Contents ${3 + n + i} 0 R >>\nendobj\n")
    }
    val bodyLens = new Array[Int](n)
    (0 until n).foreach { i =>
      val body = if (flate) deflate(pages(i).getBytes("ISO-8859-1"))
        else pages(i).getBytes("ISO-8859-1")
      bodyLens(i) = body.length
      offs += bos.size
      val lenTok = if (indirectLen) s"${3 + 2 * n + i} 0 R"
        else body.length.toString
      w(s"${3 + n + i} 0 obj\n<< /Length $lenTok" +
        (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
      bos.write(body)
      w("\nendstream\nendobj\n")
    }
    if (indirectLen) (0 until n).foreach { i =>
      offs += bos.size
      w(s"${3 + 2 * n + i} 0 obj\n${bodyLens(i)}\nendobj\n")
    }
    val xrefPos = bos.size
    val total = offs.length + 1
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offs.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF")
    bos.toByteArray
  }

  /** PDF 1.5 xref-STREAM file with real page content — the text twin
    * of [[pdfXrefStream]]. */
  private def pdfXrefStreamWithText(pages: Seq[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val n = pages.length
    w("%PDF-1.5\n")
    offs += bos.size
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    offs += bos.size
    w(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n")
    (0 until n).foreach { i =>
      offs += bos.size
      w(s"${3 + i} 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/Contents ${3 + n + i} 0 R >>\nendobj\n")
    }
    (0 until n).foreach { i =>
      val body = deflate(pages(i).getBytes("ISO-8859-1"))
      offs += bos.size
      w(s"${3 + n + i} 0 obj\n<< /Length ${body.length} " +
        "/Filter /FlateDecode >>\nstream\n")
      bos.write(body)
      w("\nendstream\nendobj\n")
    }
    val xrefObjNum = 3 + 2 * n
    val xrefPos = bos.size
    val size = xrefObjNum + 1
    val rowW = 4
    val rows = (Seq((0L, 0L)) ++ offs.map(o => (1L, o.toLong)) ++
      Seq((1L, xrefPos.toLong))).map { case (t, off) =>
      Array[Byte](t.toByte, ((off >> 8) & 0xff).toByte,
        (off & 0xff).toByte, 0.toByte)
    }
    val defl = deflate(rows.flatten.toArray)
    w(s"$xrefObjNum 0 obj\n<< /Type /XRef /Size $size /Root 1 0 R " +
      s"/W [1 2 1] /Index [0 $size] /Filter /FlateDecode " +
      s"/Length ${defl.length} >>\nstream\n")
    bos.write(defl)
    w(s"\nendstream\nendobj\nstartxref\n$xrefPos\n%%EOF")
    bos.toByteArray
  }

  test("extractPdfText: planted text recovered, classic + xref stream") {
    val p1 = "BT /F1 12 Tf 72 720 Td (Hello world) Tj ET"
    val p2 = "BT (Line one) Tj T* (line two) Tj ET"
    Seq(
      pdfWithText(Seq(p1, p2), flate = false),
      pdfWithText(Seq(p1, p2), flate = true),
      pdfWithText(Seq(p1, p2), flate = true, indirectLen = true),
      pdfXrefStreamWithText(Seq(p1, p2))).foreach { f =>
      val got = Multimodal.extractPdfText(f)
        .getOrElse(fail("did not walk"))
      assert(got == Seq(Some("Hello world"), Some("Line one\nline two")))
    }
  }

  test("contentText: TJ arrays, quote ops, hex strings, escapes") {
    def ct(s: String) = Multimodal.contentText(s.getBytes("ISO-8859-1"))
    assert(ct("[ (A) -120 (B) 33 (C) ] TJ") == "ABC")
    assert(ct("(x) Tj (y) ' (z) \"") == "x\ny\nz")
    assert(ct("<48 65 6C6C 6F> Tj <4A3> Tj") == "Hello" + "J0")
    assert(ct("(a\\(b\\)c \\101\\n\\t) Tj") == "a(b)c A\n\t")
    assert(ct("(nested (parens) kept) Tj") == "nested (parens) kept")
    assert(ct("% comment (not shown) Tj\n(real) Tj") == "real")
    assert(ct("(skip) TD (shown) Tj") == "shown")
    assert(ct("BT /F1 9 Tf 1 0 0 1 50 700 Tm (m) Tj ET") == "m")
  }

  test("extractPdfText: dict windows stop at the object's own >> (r11)") {
    // page 1 has NO /Contents and page 2's dict starts well inside a
    // fixed 8KB window past page 1 — a window overrun would steal
    // page 2's /Contents (or a following /Kids) for page 1
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    w("%PDF-1.4\n")
    // leaves FIRST, /Pages and catalog LAST (legal writer order that
    // puts the /Kids-bearing Pages dict within 8KB of every leaf)
    offs += bos.size // obj 1: page without contents
    w("1 0 obj\n<< /Type /Page /Parent 4 0 R >>\nendobj\n")
    offs += bos.size // obj 2: page with contents
    w("2 0 obj\n<< /Type /Page /Parent 4 0 R /Contents 3 0 R >>\nendobj\n")
    val body = "BT (second page) Tj ET"
    offs += bos.size // obj 3: content stream
    w(s"3 0 obj\n<< /Length ${body.length} >>\nstream\n$body\nendstream\nendobj\n")
    offs += bos.size // obj 4: pages node
    w("4 0 obj\n<< /Type /Pages /Kids [1 0 R 2 0 R] /Count 2 >>\nendobj\n")
    offs += bos.size // obj 5: catalog
    w("5 0 obj\n<< /Type /Catalog /Pages 4 0 R >>\nendobj\n")
    val xrefPos = bos.size
    w(s"xref\n0 ${offs.length + 1}\n0000000000 65535 f \n")
    offs.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offs.length + 1} /Root 5 0 R >>\n" +
      s"startxref\n$xrefPos\n%%EOF")
    val got = Multimodal.extractPdfText(bos.toByteArray)
      .getOrElse(fail("did not walk"))
    // page 1 must be None (its own dict has no /Contents — page 2's
    // 2KB away must NOT leak in), page 2 must extract; neither leaf
    // may be misread as an internal node via the Pages obj's /Kids
    assert(got == Seq(None, Some("second page")))
  }

  test("extractPdfText: corrupt Flate page loses ITS text only (r11)") {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    w("%PDF-1.4\n")
    offs += bos.size
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offs += bos.size
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>\nendobj\n")
    offs += bos.size
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n")
    offs += bos.size
    w("4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n")
    val good = deflate("BT (good page) Tj ET".getBytes("ISO-8859-1"))
    offs += bos.size
    w(s"5 0 obj\n<< /Length ${good.length} /Filter /FlateDecode >>\nstream\n")
    bos.write(good); w("\nendstream\nendobj\n")
    val bad = "this is not a deflate stream at all".getBytes("ISO-8859-1")
    offs += bos.size
    w(s"6 0 obj\n<< /Length ${bad.length} /Filter /FlateDecode >>\nstream\n")
    bos.write(bad); w("\nendstream\nendobj\n")
    val xrefPos = bos.size
    w(s"xref\n0 ${offs.length + 1}\n0000000000 65535 f \n")
    offs.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offs.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefPos\n%%EOF")
    val got = Multimodal.extractPdfText(bos.toByteArray)
      .getOrElse(fail("did not walk"))
    assert(got == Seq(Some("good page"), None))
  }

  test("extractPdfText hardening: truncation sweep + fuzz never throw") {
    val good = pdfWithText(Seq("BT (t) Tj ET"), flate = true)
    (0 until good.length).foreach { k =>
      Multimodal.extractPdfText(good.take(k)) // must not throw
    }
    val rnd = new scala.util.Random(31)
    (1 to 300).foreach { _ =>
      val f = good.clone()
      f(rnd.nextInt(f.length)) = rnd.nextInt(256).toByte
      Multimodal.extractPdfText(f) // must not throw
    }
    assert(Multimodal.extractPdfText(null).isEmpty)
    assert(Multimodal.extractPdfText("nope".getBytes).isEmpty)
  }

  /** PDF 1.5+ fixture whose catalog, page tree and page dicts ALL
    * live inside one /Type /ObjStm object stream (the modern-writer
    * layout); content streams stay regular objects (the spec forbids
    * streams inside object streams). Xref is a stream with type-2
    * entries for every compressed object. */
  private def pdfObjStm(pages: Seq[String],
      nPad: Long = -1L, firstPad: Long = -1L): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    val n = pages.length
    w("%PDF-1.5\n")
    // regular content streams: objs 3+n .. 2+2n
    val contOffs = new Array[Int](n)
    (0 until n).foreach { i =>
      val body = deflate(pages(i).getBytes("ISO-8859-1"))
      contOffs(i) = bos.size
      w(s"${3 + n + i} 0 obj\n<< /Length ${body.length} " +
        "/Filter /FlateDecode >>\nstream\n")
      bos.write(body)
      w("\nendstream\nendobj\n")
    }
    // the ObjStm: inner objs 1 (catalog), 2 (pages), 3..2+n (pages)
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    val inner = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> s"<< /Type /Pages /Kids [$kids] /Count $n >>") ++
      (0 until n).map(i => (3 + i) ->
        s"<< /Type /Page /Parent 2 0 R /Contents ${3 + n + i} 0 R >>")
    val bodies = inner.map(_._2 + "\n")
    val rel = bodies.scanLeft(0)(_ + _.length)
    val header = inner.zipWithIndex
      .map { case ((num, _), i) => s"$num ${rel(i)}" }.mkString(" ") + "\n"
    val payload = (header + bodies.mkString).getBytes("ISO-8859-1")
    val first = if (firstPad >= 0) firstPad else header.length.toLong
    val nHdr = if (nPad >= 0) nPad else inner.length.toLong
    val defl = deflate(payload)
    val stmObj = 3 + 2 * n
    val stmOff = bos.size
    w(s"$stmObj 0 obj\n<< /Type /ObjStm /N $nHdr /First $first " +
      s"/Filter /FlateDecode /Length ${defl.length} >>\nstream\n")
    bos.write(defl)
    w("\nendstream\nendobj\n")
    // xref stream, W [1 2 1], rows in obj-number order 0..size-1
    val xrefObj = stmObj + 1
    val xrefPos = bos.size
    val size = xrefObj + 1
    def row(t: Int, f2: Long, f3: Int): Array[Byte] =
      Array(t.toByte, ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte,
        f3.toByte)
    val rows =
      Seq(row(0, 0, 0)) ++
      inner.indices.map(i => row(2, stmObj, i)) ++
      contOffs.map(o => row(1, o, 0)) ++
      Seq(row(1, stmOff, 0), row(1, xrefPos, 0))
    val xdefl = deflate(rows.flatten.toArray)
    w(s"$xrefObj 0 obj\n<< /Type /XRef /Size $size /Root 1 0 R " +
      s"/W [1 2 1] /Index [0 $size] /Filter /FlateDecode " +
      s"/Length ${xdefl.length} >>\nstream\n")
    bos.write(xdefl)
    w(s"\nendstream\nendobj\nstartxref\n$xrefPos\n%%EOF")
    bos.toByteArray
  }

  test("probePdf: page count resolves through an ObjStm catalog (r12)") {
    val m = Multimodal.probePdf(pdfObjStm(Seq(
      "BT (a) Tj ET", "BT (b) Tj ET", "BT (c) Tj ET")))
      .getOrElse(fail("did not probe"))
    assert(m.xrefType == "stream")
    assert(m.pageCount == 3L, m.toString)
    assert(!m.encrypted)
  }

  test("extractPdfText: page tree inside an ObjStm recovers text (r12)") {
    val got = Multimodal.extractPdfText(pdfObjStm(Seq(
      "BT (Hello world) Tj ET",
      "BT (Line one) Tj T* (line two) Tj ET")))
      .getOrElse(fail("did not walk"))
    assert(got == Seq(Some("Hello world"), Some("Line one\nline two")))
  }

  test("ObjStm header pathologies reject the container, never misread") {
    val base = Seq("BT (x) Tj ET")
    // /N over-claims: the pair table would read into object bodies
    assert(Multimodal.extractPdfText(pdfObjStm(base, nPad = 99))
      .toSeq.flatten.flatten.isEmpty)
    // /First past the payload end
    assert(Multimodal.extractPdfText(pdfObjStm(base, firstPad = 1 << 20))
      .toSeq.flatten.flatten.isEmpty)
    // /First = 0 (no header room) rejects
    assert(Multimodal.extractPdfText(pdfObjStm(base, firstPad = 0))
      .toSeq.flatten.flatten.isEmpty)
    // and the probe degrades to page_count null, not a wrong number
    assert(Multimodal.probePdf(pdfObjStm(base, nPad = 99))
      .forall(_.pageCount == -1L))
  }

  test("ObjStm hardening: truncation sweep + fuzz never throw (r12)") {
    val good = pdfObjStm(Seq("BT (t) Tj ET", "BT (u) Tj ET"))
    (0 until good.length).foreach { k =>
      Multimodal.extractPdfText(good.take(k)) // must not throw
      Multimodal.probePdf(good.take(k))
    }
    val rnd = new scala.util.Random(37)
    (1 to 300).foreach { _ =>
      val f = good.clone()
      f(rnd.nextInt(f.length)) = rnd.nextInt(256).toByte
      Multimodal.extractPdfText(f) // must not throw
      Multimodal.probePdf(f)
    }
  }

  test("extractPdfText: content-less page reports null, not a throw") {
    // pdfClassic pages carry no /Contents at all
    val got = Multimodal.extractPdfText(pdfClassic(2))
      .getOrElse(fail("did not walk"))
    assert(got == Seq(None, None))
  }

  test("extractPdfTextDf wrapper: per-page rows, ok flags") {
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, pdfWithText(Seq("BT (pg one) Tj ET",
          "BT (pg two) Tj ET"), flate = true)),
        Row(2L, "plain text".getBytes),
        Row(3L, null))),
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload", BinaryType))))
    val out = Multimodal.extractPdfTextDf(media).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) null else r.getString(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(out == Seq(
      (1L, true, 1, "pg one"), (1L, true, 2, "pg two"),
      (2L, false, -1, null), (3L, false, -1, null)))
  }
}
