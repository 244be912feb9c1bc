package graft

import org.apache.spark.sql.functions._

import graft.plans.{BytesCodecUtil, DecodeBodyExpr, DecodeBodyUtil}

/** decode_body: header-charset, meta-sniff, UTF-8 fallback, unknown
  * charset, totality; gzip_bytes/gunzip_bytes round-trip. */
class DecodeBodySpec extends SparkSpec {

  private val polish = "Żółć gęślą jaźń"
  private val dutch = "één beurs café"

  test("Content-Type charset param wins") {
    val b = polish.getBytes("windows-1250")
    assert(DecodeBodyUtil.decode(b,
      "text/html; charset=windows-1250") == polish)
    assert(DecodeBodyUtil.decode(b,
      "text/html; CHARSET=\"windows-1250\"") == polish)
    val l = dutch.getBytes("ISO-8859-1")
    assert(DecodeBodyUtil.decode(l,
      "text/html;charset=iso-8859-1") == dutch)
    // the header beats a (wrong) meta sniff
    val h = ("<meta charset=\"utf-8\">" + polish).getBytes("windows-1250")
    assert(DecodeBodyUtil.decode(h, "text/html; charset=windows-1250")
      == "<meta charset=\"utf-8\">" + polish)
  }

  test("meta sniff when the header has no charset") {
    val html = "<html><head><meta charset='windows-1250'></head>" +
      "<body>" + polish + "</body></html>"
    assert(DecodeBodyUtil.decode(html.getBytes("windows-1250"),
      "text/html") == html)
    val equiv = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=ISO-8859-1\"></head><body>" +
      dutch + "</body></html>"
    assert(DecodeBodyUtil.decode(equiv.getBytes("ISO-8859-1"),
      null) == equiv)
    // the sniff is BOUNDED: a charset declared past 1024 bytes is
    // invisible and the body falls back to UTF-8
    val far = (" " * 1100) + "<meta charset='windows-1250'>" + polish
    assert(DecodeBodyUtil.decode(far.getBytes("windows-1250"), "")
      != far)
  }

  test("UTF-8 fallback, unknown charset, malformed bytes are total") {
    assert(DecodeBodyUtil.decode(polish.getBytes("UTF-8"), "text/html")
      == polish)
    assert(DecodeBodyUtil.decode(polish.getBytes("UTF-8"),
      "text/html; charset=no-such-charset-99") == polish)
    // invalid UTF-8 decodes to U+FFFD, never throws
    val bad = Array[Byte](0x41, 0xC3.toByte, 0x28, 0x42)
    val s = DecodeBodyUtil.decode(bad, "")
    assert(s.length == 4 && s.charAt(0) == 'A' && s.charAt(3) == 'B')
    assert(DecodeBodyUtil.decode(Array.empty[Byte], null) == "")
  }

  test("column face: null Content-Type still sniffs") {
    val html = "<meta charset=windows-1250>" + polish
    val df = spark.range(1).toDF("id").select(
      DecodeBodyExpr.decodeBody(
        lit(html.getBytes("windows-1250")),
        lit(null).cast("string")).as("text"))
    assert(df.collect()(0).getString(0) == html)
  }

  test("BOM outranks Content-Type and strips (r14)") {
    def withBom(bom: Array[Byte], body: Array[Byte]): Array[Byte] =
      bom ++ body
    val utf8Bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte)
    val beBom = Array(0xFE, 0xFF).map(_.toByte)
    val leBom = Array(0xFF, 0xFE).map(_.toByte)
    // UTF-8 BOM beats a wrong header charset; BOM bytes strip
    assert(DecodeBodyUtil.decode(
      withBom(utf8Bom, polish.getBytes("UTF-8")),
      "text/html; charset=ISO-8859-1") == polish)
    // UTF-16 both endiannesses, header absent and header wrong
    assert(DecodeBodyUtil.decode(
      withBom(beBom, polish.getBytes("UTF-16BE")), null) == polish)
    assert(DecodeBodyUtil.decode(
      withBom(leBom, dutch.getBytes("UTF-16LE")),
      "text/html; charset=windows-1250") == dutch)
    // a BOM alone decodes to '' (all metadata, no content)
    assert(DecodeBodyUtil.decode(utf8Bom, null) == "")
    assert(DecodeBodyUtil.decode(leBom, null) == "")
    // no BOM: FE/FF-free bodies take the old path untouched
    assert(DecodeBodyUtil.decode(polish.getBytes("UTF-8"), "") == polish)
  }

  test("sniff anchors to a <meta> span: free-text charset= is inert (r14)") {
    // an early URL carrying charset= must NOT hijack the decode
    val trap = "<a href=\"/conv?charset=ISO-8859-1\">x</a>" +
      "<meta charset='windows-1250'>" + polish
    assert(DecodeBodyUtil.decode(trap.getBytes("windows-1250"), "")
      == trap)
    // script text with a bare charset= token: inert, falls to UTF-8
    val noise = "<script>var charset=latin2;</script>" + polish
    assert(DecodeBodyUtil.decode(noise.getBytes("UTF-8"), "") == noise)
    // an unterminated <meta at the window edge still sniffs (span
    // bounds to the window end)
    val open = "<meta charset=windows-1250 " + polish
    assert(DecodeBodyUtil.decode(open.getBytes("windows-1250"), "")
      == open)
  }

  test("sniff_mime: magic-byte table, text sniff, unknown -> null (r14)") {
    import graft.plans.SniffMimeUtil.{sniff => sm}
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    assert(sm("%PDF-1.7 junk".getBytes("ISO-8859-1")) == "application/pdf")
    assert(sm(b(0xFF, 0xD8, 0xFF, 0xE0, 1, 2)) == "image/jpeg")
    assert(sm(b(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 9))
      == "image/png")
    assert(sm("GIF89a....".getBytes("ISO-8859-1")) == "image/gif")
    assert(sm(b(0x1F, 0x8B, 8, 0)) == "application/gzip")
    assert(sm(b('P', 'K', 3, 4, 0)) == "application/zip")
    assert(sm("OggS junk".getBytes("ISO-8859-1")) == "application/ogg")
    assert(sm("ID3 tagged mp3".getBytes("ISO-8859-1")) == "audio/mpeg")
    assert(sm("RIFF1234WEBPVP8 ".getBytes("ISO-8859-1")) == "image/webp")
    assert(sm("RIFF1234WAVEfmt ".getBytes("ISO-8859-1")) == "audio/wav")
    assert(sm("RIFF1234AVI LIST".getBytes("ISO-8859-1"))
      == "video/x-msvideo")
    assert(sm("????ftypisom".getBytes("ISO-8859-1")) == "video/mp4")
    // text sniff skips an optional UTF-8 BOM + whitespace, case-blind
    assert(sm("\n \t<!DOCTYPE HTML><html>".getBytes("ISO-8859-1"))
      == "text/html")
    assert(sm(b(0xEF, 0xBB, 0xBF) ++
      "  <html lang=en>".getBytes("ISO-8859-1")) == "text/html")
    assert(sm("<?xml version=\"1.0\"?>".getBytes("ISO-8859-1"))
      == "application/xml")
    // unknown/short/null: never a guess, never a throw
    assert(sm("plain prose".getBytes("ISO-8859-1")) == null)
    assert(sm(b(0x00)) == null)
    assert(sm(Array.empty[Byte]) == null)
    assert(sm(null) == null)
    // RIFF with an unknown fourcc falls through to null, not a guess
    assert(sm("RIFF1234XXXX".getBytes("ISO-8859-1")) == null)
  }

  test("gzip_bytes/gunzip_bytes round-trip; corrupt gunzip nulls") {
    val payload = ("x" * 10000 + polish).getBytes("UTF-8")
    assert(java.util.Arrays.equals(
      BytesCodecUtil.gunzip(BytesCodecUtil.gzip(payload)), payload))
    assert(BytesCodecUtil.gunzip(
      Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3)) == null)
    val df = spark.range(1).toDF("id").select(
      graft.plans.BytesCodecExpr.gunzipBytes(
        graft.plans.BytesCodecExpr.gzipBytes(
          lit(payload))).cast("string").as("s"))
    assert(df.collect()(0).getString(0) == "x" * 10000 + polish)
  }

  test("base32_bytes: RFC 4648 vectors + WARC sha1 digest (r14)") {
    import graft.plans.BytesCodecUtil.base32
    // RFC 4648 §10 test vectors, unpadded
    assert(base32(Array.empty[Byte]) == "")
    assert(base32("f".getBytes) == "MY")
    assert(base32("fo".getBytes) == "MZXQ")
    assert(base32("foo".getBytes) == "MZXW6")
    assert(base32("foob".getBytes) == "MZXW6YQ")
    assert(base32("fooba".getBytes) == "MZXW6YTB")
    assert(base32("foobar".getBytes) == "MZXW6YTBOI")
    // 20-byte SHA-1 encodes to exactly 32 chars, no pad ever needed
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest("abc".getBytes("UTF-8"))
    assert(base32(sha).length == 32)
    // the composed WARC digest column face matches MessageDigest
    val df = spark.range(1).select(
      graft.plans.BytesCodecExpr.warcSha1Digest(
        lit("abc".getBytes("UTF-8"))).as("d"))
    assert(df.collect()(0).getString(0) == "sha1:" + base32(sha))
  }
}
