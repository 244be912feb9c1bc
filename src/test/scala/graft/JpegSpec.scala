package graft

import graft.llm.Multimodal

/** Baseline-JPEG decoder spec over hand-assembled bitstreams: every
  * fixture is built marker-by-marker with tiny custom Huffman tables
  * whose entropy bits are computed by hand, so expected pixel values
  * follow from the IDCT definition (a DC-only block decodes flat at
  * dc·q/8 + 128), not from a second decoder implementation. */
class JpegSpec extends SparkSpec {

  // --- fixture assembly helpers -------------------------------------
  private def hi(v: Int): Byte = ((v >> 8) & 0xff).toByte
  private def lo(v: Int): Byte = (v & 0xff).toByte

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte,
      hi(payload.length + 2), lo(payload.length + 2)) ++ payload

  /** DQT with a flat 8-bit table (all entries = q). */
  private def dqt(id: Int, q: Int): Array[Byte] =
    seg(0xdb, Array(id.toByte) ++ Array.fill(64)(q.toByte))

  /** DHT from (#codes per length 1..16, symbols). */
  private def dht(cls: Int, id: Int, counts: Array[Int],
      syms: Array[Int]): Array[Byte] =
    seg(0xc4, Array(((cls << 4) | id).toByte) ++
      counts.map(_.toByte) ++ syms.map(_.toByte))

  private def sof(w: Int, h: Int,
      comps: Seq[(Int, Int, Int, Int)]): Array[Byte] =
    seg(0xc0, Array[Byte](8, hi(h), lo(h), hi(w), lo(w),
      comps.size.toByte) ++
      comps.flatMap { case (id, hh, vv, tq) =>
        Seq(id.toByte, ((hh << 4) | vv).toByte, tq.toByte) })

  private def sos(comps: Seq[(Int, Int, Int)]): Array[Byte] =
    seg(0xda, Array(comps.size.toByte) ++
      comps.flatMap { case (id, td, ta) =>
        Seq(id.toByte, ((td << 4) | ta).toByte) } ++
      Array[Byte](0, 63, 0))

  private class BitWriter {
    private val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def put(s: String): this.type = { s.foreach(c => bits += (c - '0')); this }
    /** Pad with 1s to a byte boundary; 0xFF bytes get a stuffed 0x00. */
    def bytes: Array[Byte] = {
      val padded = bits ++ Seq.fill((8 - bits.size % 8) % 8)(1)
      padded.grouped(8).flatMap { g =>
        val v = g.foldLeft(0)((a, b) => (a << 1) | b)
        if (v == 0xff) Seq(0xff.toByte, 0x00.toByte) else Seq(v.toByte)
      }.toArray
    }
  }

  // DC table: cat0 -> "0", cat3 -> "10". AC table: EOB -> "0",
  // (run 0, size 3) -> "10".
  private val dcCounts = Array(1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val dcSyms = Array(0, 3)
  private val acSyms = Array(0x00, 0x03)

  private val soi = Array(0xff.toByte, 0xd8.toByte)
  private val eoi = Array(0xff.toByte, 0xd9.toByte)

  private def grayHeader(w: Int, h: Int): Array[Byte] =
    soi ++ dqt(0, 16) ++ dht(0, 0, dcCounts, dcSyms) ++
      dht(1, 0, dcCounts, acSyms) ++ sof(w, h, Seq((1, 1, 1, 0))) ++
      sos(Seq((1, 0, 0)))

  private def lumaGrid(b: Array[Byte]): Option[(Int, Int, Array[Int])] =
    Multimodal.decodeJpeg(b).map(img => (img.width, img.height,
      img.luma.map(f => math.round(f * 255.0f))))

  test("flat DC-only grayscale block decodes to dc*q/8 + 128") {
    // DC diff 5 (cat 3, bits 101), EOB: value = 5*16/8 + 128 = 138
    val payload = grayHeader(8, 8) ++
      new BitWriter().put("10").put("101").put("0").bytes ++ eoi
    val out = lumaGrid(payload)
    assert(out.isDefined)
    val (w, h, px) = out.get
    assert(w == 8 && h == 8)
    assert(px.forall(_ == 138), s"got ${px.toSeq.distinct}")
  }

  test("DC prediction chains across blocks; negative diffs extend") {
    // 16x8: block 1 diff +5 -> DC 5 (value 138); block 2 diff -4
    // (cat 3, complement bits 011) -> DC 1 (value 130)
    val payload = grayHeader(16, 8) ++
      new BitWriter().put("10").put("101").put("0") // block 1
        .put("10").put("011").put("0") // block 2
        .bytes ++ eoi
    val (w, h, px) = lumaGrid(payload).get
    assert(w == 16 && h == 8)
    (0 until 8).foreach { y =>
      (0 until 8).foreach(x => assert(px(y * 16 + x) == 138))
      (8 until 16).foreach(x => assert(px(y * 16 + x) == 130))
    }
  }

  test("one AC coefficient produces the cosine column profile") {
    // DC 0 (cat0 "0"), AC (0,3) value 4 at zigzag k=1 (coef u=1),
    // then EOB: rows identical, columns strictly decreasing (cos
    // profile over x), mean 128
    val payload = grayHeader(8, 8) ++
      new BitWriter().put("0").put("10").put("100").put("0").bytes ++ eoi
    val (_, _, px) = lumaGrid(payload).get
    val row0 = (0 until 8).map(x => px(x))
    (1 until 8).foreach(y =>
      (0 until 8).foreach(x => assert(px(y * 8 + x) == row0(x))))
    (1 until 8).foreach(x => assert(row0(x) < row0(x - 1),
      s"not decreasing: $row0"))
    assert(math.abs(row0.sum / 8.0 - 128.0) < 1.0, s"mean: $row0")
  }

  test("interleaved 4:4:4 color: chroma blocks parsed, luma from Y") {
    // three components 1:1:1; each block DC-only: Y diff 5, Cb diff
    // -4, Cr diff 0 — luma must be 138 everywhere (Y channel alone)
    val payload = soi ++ dqt(0, 16) ++ dqt(1, 16) ++
      dht(0, 0, dcCounts, dcSyms) ++ dht(1, 0, dcCounts, acSyms) ++
      sof(8, 8, Seq((1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1))) ++
      sos(Seq((1, 0, 0), (2, 0, 0), (3, 0, 0))) ++
      new BitWriter().put("10").put("101").put("0") // Y
        .put("10").put("011").put("0") // Cb
        .put("0").put("0") // Cr (diff 0, EOB)
        .bytes ++ eoi
    val (w, h, px) = lumaGrid(payload).get
    assert(w == 8 && h == 8)
    assert(px.forall(_ == 138), s"got ${px.toSeq.distinct}")
  }

  test("4:2:0 subsampling: four Y blocks per MCU, quadrant values") {
    // 16x16, Y sampled 2x2 + single Cb/Cr blocks. Y DC diffs:
    // +5, -4, 0, +5 -> DCs 5,1,1,6 -> values 138,130,130,140 in
    // raster quadrants (TL,TR,BL,BR)
    val payload = soi ++ dqt(0, 16) ++ dqt(1, 16) ++
      dht(0, 0, dcCounts, dcSyms) ++ dht(1, 0, dcCounts, acSyms) ++
      sof(16, 16, Seq((1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1))) ++
      sos(Seq((1, 0, 0), (2, 0, 0), (3, 0, 0))) ++
      new BitWriter()
        .put("10").put("101").put("0") // Y TL: +5
        .put("10").put("011").put("0") // Y TR: -4
        .put("0").put("0") // Y BL: 0
        .put("10").put("101").put("0") // Y BR: +5
        .put("0").put("0") // Cb
        .put("0").put("0") // Cr
        .bytes ++ eoi
    val (w, h, px) = lumaGrid(payload).get
    assert(w == 16 && h == 16)
    assert(px(0) == 138 && px(8) == 130)
    assert(px(8 * 16) == 130 && px(8 * 16 + 8) == 140)
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        assert(px(y * 16 + x) == 138)
        assert(px(y * 16 + x + 8) == 130)
        assert(px((y + 8) * 16 + x) == 130)
        assert(px((y + 8) * 16 + x + 8) == 140)
      }
    }
  }

  test("restart markers reset DC prediction and byte alignment") {
    // 16x8 gray with DRI=1: MCU 1, RST0, MCU 2. Both blocks diff +5
    // from a RESET predictor -> both 138 (without the reset the
    // second would be 148)
    val dri = seg(0xdd, Array[Byte](0, 1))
    val b1 = new BitWriter().put("10").put("101").put("0").bytes
    val b2 = new BitWriter().put("10").put("101").put("0").bytes
    val payload = soi ++ dqt(0, 16) ++ dht(0, 0, dcCounts, dcSyms) ++
      dht(1, 0, dcCounts, acSyms) ++ dri ++
      sof(16, 8, Seq((1, 1, 1, 0))) ++ sos(Seq((1, 0, 0))) ++
      b1 ++ Array(0xff.toByte, 0xd0.toByte) ++ b2 ++ eoi
    val (w, h, px) = lumaGrid(payload).get
    assert(w == 16 && h == 8)
    assert(px.forall(_ == 138), s"got ${px.toSeq.distinct}")
  }

  test("malformed and unsupported streams are rejected, never thrown") {
    val good = grayHeader(8, 8) ++
      new BitWriter().put("10").put("101").put("0").bytes ++ eoi
    // truncated entropy data
    assert(Multimodal.decodeJpeg(good.dropRight(3)).isEmpty)
    // truncated header
    assert(Multimodal.decodeJpeg(good.take(6)).isEmpty)
    // progressive SOF2
    val prog = good.clone()
    val sofAt = good.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    prog(sofAt + 1) = 0xc2.toByte
    assert(Multimodal.decodeJpeg(prog).isEmpty)
    // dimension bomb: 65535 x 65535 declared from a tiny payload
    val bomb = soi ++ dqt(0, 16) ++ dht(0, 0, dcCounts, dcSyms) ++
      dht(1, 0, dcCounts, acSyms) ++
      sof(65535, 65535, Seq((1, 1, 1, 0))) ++ sos(Seq((1, 0, 0))) ++
      new BitWriter().put("0").put("0").bytes ++ eoi
    assert(Multimodal.decodeJpeg(bomb).isEmpty)
    // not a JPEG at all
    assert(Multimodal.decodeJpeg(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeJpeg(null).isEmpty)
  }

  test("random bytes behind a JPEG signature never throw or hang") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { i =>
      val body = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(body)
      val payload = soi ++ body
      Multimodal.decodeJpeg(payload) // must return, Some or None
    }
    // bit-flip fuzz over a valid file: single-byte corruptions
    val good = grayHeader(8, 8) ++
      new BitWriter().put("10").put("101").put("0").bytes ++ eoi
    (0 until good.length).foreach { i =>
      val c = good.clone()
      c(i) = (c(i) ^ 0x55).toByte
      Multimodal.decodeJpeg(c)
    }
  }

  test("decodeFeature dispatches JPEG to the real decoder") {
    // a real baseline JPEG must produce the pooled-luma features of
    // its decoded plane, not the byte-hash stub
    val payload = grayHeader(8, 8) ++
      new BitWriter().put("10").put("101").put("0").bytes ++ eoi
    val viaDispatch = Multimodal.decodeFeature(payload, 4)
    assert(viaDispatch.isDefined)
    // flat 138-luma image: every pooled cell = 138/255
    viaDispatch.get.foreach(f =>
      assert(math.abs(f - 138.0f / 255.0f) < 1e-4))
  }
}
