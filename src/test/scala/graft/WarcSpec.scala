package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.Warc

/** WARC container reader: record framing, HTTP payload lift, gzip
  * member-per-record layout, and the reject-don't-misread posture
  * under truncation/corruption. */
class WarcSpec extends SparkSpec {

  private def bytes(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  private def record(recType: String, uri: String, body: String,
      contentType: String = "application/http;msgtype=response"): String = {
    s"WARC/1.0\r\nWARC-Type: $recType\r\n" +
      (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") +
      "WARC-Date: 2024-01-02T03:04:05Z\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n" + body + "\r\n\r\n"
  }

  private def httpResp(html: String, status: Int = 200): String =
    s"HTTP/1.1 $status OK\r\nContent-Type: text/html\r\n\r\n" + html

  private val twoRec: Array[Byte] = bytes(
    record("request", "https://a.com/x",
      "GET /x HTTP/1.1\r\nHost: a.com\r\n\r\n",
      contentType = "application/http;msgtype=request") +
    record("response", "https://a.com/x",
      httpResp("<html><body><p>hello warc</p></body></html>")))

  test("two-record file: framing, http lift, headers") {
    val recs = Warc.parse(twoRec).getOrElse(fail("did not parse"))
    assert(recs.length == 2)
    assert(recs.map(_.recType) == Seq("request", "response"))
    assert(recs.forall(_.targetUri == "https://a.com/x"))
    assert(recs.forall(_.date == "2024-01-02T03:04:05Z"))
    // request record: status lifted from its OWN http message
    assert(recs(0).httpStatus.isEmpty) // "GET /x" is not a response
    assert(recs(1).httpStatus.contains(200))
    assert(new String(recs(1).body, "ISO-8859-1")
      == "<html><body><p>hello warc</p></body></html>")
  }

  test("gzip member-per-record layout round-trips") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    val memberPerRecord = gz(bytes(record("response", "https://b.com/1",
      httpResp("<p>one</p>")))) ++
      gz(bytes(record("response", "https://b.com/2",
        httpResp("<p>two</p>"))))
    val recs = Warc.parse(memberPerRecord).getOrElse(fail("no parse"))
    assert(recs.map(_.targetUri) ==
      Seq("https://b.com/1", "https://b.com/2"))
    assert(recs.map(r => new String(r.body, "ISO-8859-1")) ==
      Seq("<p>one</p>", "<p>two</p>"))
  }

  test("reject-don't-misread: bad framing drops the tail, not the prefix") {
    // corrupt the SECOND record's Content-Length: the first record
    // stays, the unreachable tail drops
    val good = record("response", "https://a.com/1", httpResp("<p>a</p>"))
    val bad = good + "WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: notanumber\r\n\r\nbody\r\n\r\n"
    val recs = Warc.parse(bytes(bad)).getOrElse(fail("no parse"))
    assert(recs.length == 1 && recs.head.targetUri == "https://a.com/1")
    // a header VALUE containing "warc-target-uri:" must not satisfy
    // the header lookup for a record that lacks the real header
    val sneaky = record("response", null,
      httpResp("<p>x</p>")).replace("WARC-Date:",
      "X-Note: see warc-target-uri: https://evil.com\r\nWARC-Date:")
    val r2 = Warc.parse(bytes(sneaky)).getOrElse(fail("no parse"))
    assert(r2.head.targetUri == null)
    // not WARC at all
    assert(Warc.parse("HTTP/1.1 200 OK\r\n\r\n".getBytes).isEmpty)
    assert(Warc.parse(null).isEmpty)
    assert(Warc.parse(Array.empty[Byte]).isEmpty)
  }

  test("hardening: truncation sweep + fuzz never throw") {
    (0 until twoRec.length).foreach { k =>
      Warc.parse(twoRec.take(k)) // must not throw
    }
    val rnd = new scala.util.Random(41)
    (1 to 300).foreach { _ =>
      val f = twoRec.clone()
      f(rnd.nextInt(f.length)) = rnd.nextInt(256).toByte
      Warc.parse(f) // must not throw
    }
    // corrupt gzip rejects cleanly
    val gzBad = Array[Byte](0x1f.toByte, 0x8b.toByte, 1, 2, 3, 4, 5, 6)
    assert(Warc.parse(gzBad).isEmpty)
  }

  test("zero-record WARC magic is parse_ok=false, not an empty success") {
    // starts with WARC/ but the first record never terminates its
    // header block: parse() keeps Some(empty), the DataFrame face
    // must NOT report it as a parsed archive (consumers filter on
    // parse_ok — ADVICE r12)
    val zombie = bytes("WARC/1.0\r\nWARC-Type: response\r\nno terminator")
    assert(Warc.parse(zombie).exists(_.isEmpty))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9L, zombie))),
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload", BinaryType))))
    val out = Warc.warcRecords(media).collect()
    assert(out.length == 1 && !out(0).getBoolean(1))
  }

  test("http Content-Type lifts from the HTTP message headers") {
    val recs = Warc.parse(twoRec).getOrElse(fail("no parse"))
    assert(recs(1).httpContentType == "text/html")
    assert(recs(0).httpContentType == null) // a request has none here
  }

  private def gzBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  test("Transfer-Encoding: chunked bodies de-chunk transparently") {
    import graft.llm.{Warc => W}
    def chunked(pieces: String*): String =
      pieces.map(p => f"${p.length}%x\r\n$p\r\n").mkString + "0\r\n\r\n"
    // unit: framing round-trips, extensions drop, trailers ignored
    assert(new String(W.dechunk(bytes(chunked("hello ", "world"))),
      "ISO-8859-1") == "hello world")
    assert(new String(W.dechunk(bytes(
      "6;ext=1\r\nhello \r\n5\r\nworld\r\n0\r\nX-Trailer: 1\r\n\r\n")),
      "ISO-8859-1") == "hello world")
    // malformed framing rejects the TRANSFORM (null), not the bytes
    assert(W.dechunk(bytes("zz\r\nhello")) == null)
    assert(W.dechunk(bytes("6\r\nhello")) == null) // truncated data
    assert(W.dechunk(bytes("5\r\nhelloXX")) == null) // bad chunk end
    // through the record face: the body column is the PAYLOAD
    val html = "<p>de-chunked payload</p>"
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n" + chunked(html)
    val rec = bytes(record("response", "https://c.com/1", http))
    val recs = W.parse(rec).getOrElse(fail("no parse"))
    assert(new String(recs.head.body, "ISO-8859-1") == html)
    // malformed chunk stream: raw body survives
    val bad = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "not chunked at all"
    val recs2 = W.parse(bytes(record("response", "https://c.com/2",
      bad))).getOrElse(fail("no parse"))
    assert(new String(recs2.head.body, "ISO-8859-1") ==
      "not chunked at all")
  }

  test("record ids, concurrent-to and Location lift (r14)") {
    import graft.llm.{Warc => W}
    val http = "HTTP/1.1 301 Moved Permanently\r\n" +
      "Location: /new/here\r\nContent-Type: text/html\r\n\r\nmoved"
    val rec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://a.com/old\r\n" +
      "WARC-Record-ID: <urn:uuid:resp-1>\r\n" +
      "WARC-Concurrent-To: <urn:uuid:req-1>\r\n" +
      "WARC-Date: 2024-01-02T00:00:00Z\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n$http\r\n\r\n"
    val r = W.parse(bytes(rec)).getOrElse(fail("no parse")).head
    assert(r.recordId == "<urn:uuid:resp-1>")
    assert(r.concurrentTo == "<urn:uuid:req-1>")
    assert(r.httpLocation == "/new/here")
    assert(r.httpStatus.contains(301))
    // absent headers stay null
    val plainHttp = "HTTP/1.1 200 OK\r\n\r\npayload"
    val plain = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://a.com/x\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${plainHttp.length}\r\n\r\n$plainHttp\r\n\r\n"
    val p = W.parse(bytes(plain)).getOrElse(fail("no parse")).head
    assert(p.recordId == null && p.concurrentTo == null &&
      p.httpLocation == null)
  }

  test("dechunk requires full-body consumption: coincidental framing keeps raw (r14)") {
    import graft.llm.{Warc => W}
    // an ALREADY-DECODED body whose prefix validates as chunk framing
    // (hex size line, consistent CRLFs, a zero chunk mid-body) must
    // come back raw, not truncated at the accidental terminator
    val decoyStr = "5\r\nhello\r\n0\r\n\r\n ...the real article text " +
      "continues after what looks like a terminator"
    assert(W.dechunk(decoyStr.getBytes("ISO-8859-1")) == null)
    // residual junk after the trailer section also rejects
    assert(W.dechunk(
      "5\r\nhello\r\n0\r\nX-T: 1\r\n\r\ntail".getBytes("ISO-8859-1"))
      == null)
    // exact endings all still accept: bare "0\r\n", "0\r\n\r\n",
    // and a trailer section that lands at the end
    assert(new String(W.dechunk("5\r\nhello\r\n0\r\n".getBytes("ISO-8859-1")),
      "ISO-8859-1") == "hello")
    assert(new String(
      W.dechunk("5\r\nhello\r\n0\r\n\r\n".getBytes("ISO-8859-1")),
      "ISO-8859-1") == "hello")
    assert(new String(W.dechunk(
      "5\r\nhello\r\n0\r\nX-T: 1\r\n\r\n".getBytes("ISO-8859-1")),
      "ISO-8859-1") == "hello")
    // through the record face: the retained-header-over-decoded-body
    // archive shape keeps its bytes verbatim
    val kept = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      decoyStr
    val recs = W.parse(bytes(record("response", "https://c.com/3",
      kept))).getOrElse(fail("no parse"))
    assert(new String(recs.head.body, "ISO-8859-1") == decoyStr)
  }

  test("warcFiles: directory of .warc.gz / .warc files, streaming") {
    val dir = tmpDir("warcfiles")
    // member-per-record gzip (the real .warc.gz layout)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.warc.gz"),
      gzBytes(bytes(record("response", "https://a.com/1",
        httpResp("<p>one</p>")))) ++
        gzBytes(bytes(record("response", "https://a.com/2",
          httpResp("<p>two</p>")))))
    // plain .warc
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "b.warc"), twoRec)
    // not WARC at all
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "junk.bin"),
      "<html>not a warc</html>".getBytes)
    val out = Warc.warcFiles(spark, dir).collect()
    val ok = out.filter(_.getBoolean(1))
    val bad = out.filter(!_.getBoolean(1))
    assert(ok.length == 4 && bad.length == 1)
    assert(bad(0).getString(0).endsWith("junk.bin"))
    val uris = ok.filter(r => r.getString(3) == "response")
      .map(_.getString(4)).sorted.toSeq
    assert(uris == Seq("https://a.com/1", "https://a.com/2",
      "https://a.com/x"))
    // the body column feeds the same downstream plan as warcRecords
    val texts = Warc.warcFiles(spark, dir)
      .filter(col("warc_type") === "response" &&
        col("http_status") === 200)
      .select(graft.plans.HtmlTextExpr.htmlToText(
        col("body").cast("string")).as("t"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(texts == Seq("hello warc", "one", "two"))
  }

  test("conversion records: refers_to lift + WET round trip (r14)") {
    // a WET-style derivative: conversion record whose WARC-Refers-To
    // names the source capture; text/plain payload passes through
    // liftHttp untouched (not application/http)
    val wet =
      "WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://a.com/x\r\n" +
      "WARC-Date: 2024-01-02T03:04:06Z\r\n" +
      "WARC-Refers-To: <urn:uuid:orig-1>\r\n" +
      "Content-Type: text/plain\r\n" +
      "Content-Length: 9\r\n\r\nwet text!\r\n\r\n"
    // byte-column face
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, bytes(wet))),
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload", BinaryType))))
    val r = Warc.warcRecords(df).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[String]("warc_type") == "conversion")
    assert(row.getAs[String]("refers_to") == "<urn:uuid:orig-1>")
    assert(new String(row.getAs[Array[Byte]]("body"), "UTF-8")
      == "wet text!")
    // file face through the member-per-record writer
    val dir = tmpDir("wetround")
    val glob = Warc.writeArchiveDir(df.select(col("payload")),
      "payload", dir + "/wet", parts = 2, memberPerRecord = true)
    val back = Warc.warcFiles(spark, glob).collect()
    assert(back.length == 1)
    assert(back(0).getAs[String]("refers_to") == "<urn:uuid:orig-1>")
    assert(new String(back(0).getAs[Array[Byte]]("body"), "UTF-8")
      == "wet text!")
  }

  test("cache/validator header lift: Last-Modified, ETag, Cache-Control (r14)") {
    val resp = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Cache-Control: max-age=3600, public\r\n" +
      "Last-Modified: Tue, 02 Jan 2024 00:00:00 GMT\r\n" +
      "etag: W/\"abc\"\r\n\r\n<p>x</p>" // lowercase etag: lookup is ci
    val recs = Warc.parse(bytes(record("response", "https://a.com/c",
      resp))).getOrElse(fail("did not parse"))
    assert(recs.length == 1)
    assert(recs(0).httpCacheControl == "max-age=3600, public")
    assert(recs(0).httpLastModified == "Tue, 02 Jan 2024 00:00:00 GMT")
    assert(recs(0).httpEtag == "W/\"abc\"")
    // absent headers stay null; non-HTTP records stay all-null
    val bare = Warc.parse(bytes(record("response", "https://a.com/d",
      httpResp("<p>y</p>")))).getOrElse(fail("did not parse"))
    assert(bare(0).httpCacheControl == null && bare(0).httpEtag == null
      && bare(0).httpLastModified == null)
  }

  test("warcFiles: a >512MB archive streams without cap breach") {
    // 140 records x 4 MB body = 560 MB uncompressed — far past the
    // byte-column face's maxGunzip=512MB, which must NOT apply on
    // the file path (records decode incrementally; memory is
    // O(record)). Bodies compress ~1000x so the fixture writes fast.
    val dir = tmpDir("warcbig")
    val body = "a" * (4 << 20)
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(
          new java.io.File(dir, "big.warc.gz")), 1 << 20))
    (0 until 140).foreach { i =>
      out.write(bytes(record("response", s"https://big.com/$i",
        httpResp(body))))
    }
    out.close()
    val df = Warc.warcFiles(spark, dir)
    val n = df.filter(col("parse_ok") && col("warc_type") === "response")
      .count()
    assert(n == 140)
    // and the payloads really decoded (length survives the walk)
    val lens = df.select(org.apache.spark.sql.functions.length(
      col("body")).as("l")).agg(min("l"), max("l")).collect()(0)
    assert(lens.getInt(0) == body.length && lens.getInt(1) == body.length)
  }

  test("warcRecords DataFrame face: per-record rows, not-ok row") {
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, twoRec),
        Row(2L, "plain bytes".getBytes),
        Row(3L, null))),
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload", BinaryType))))
    val out = Warc.warcRecords(media).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(3)) null else r.getString(3)))
      .sortBy(t => (t._1, String.valueOf(t._3))).toSeq
    assert(out == Seq((1L, true, "request"), (1L, true, "response"),
      (2L, false, null), (3L, false, null)))
    // the response body feeds the html kernel directly
    val text = Warc.warcRecords(media)
      .filter(col("warc_type") === "response" && col("http_status") === 200)
      .select(graft.plans.HtmlTextExpr.htmlToText(
        col("body").cast("string")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(text == Seq("hello warc"))
  }

  test("writeArchiveDir: both gzip layouts round-trip through warcFiles") {
    import spark.implicits._
    val payloads = (0 until 20).map { i =>
      bytes(record("response", s"https://w.com/$i",
        httpResp(s"<p>rec $i</p>")))
    }
    val df = spark.createDataset(payloads).toDF("payload")
    def sizeOf(dir: String): Long = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".warc.gz")).map(_.length).sum
    val uris = (0 until 20).map(i => s"https://w.com/$i").sorted
    val dirs = Seq(false, true).map { mpr =>
      val dir = tmpDir(s"warcwrite$mpr")
      val glob = Warc.writeArchiveDir(df, "payload", dir,
        parts = 4, memberPerRecord = mpr)
      val back = Warc.warcFiles(spark, glob).filter(col("parse_ok"))
        .select("target_uri").collect().map(_.getString(0)).sorted
      assert(back.toSeq == uris, s"memberPerRecord=$mpr")
      // rewriting the same directory never doubles records
      Warc.writeArchiveDir(df, "payload", dir,
        parts = 4, memberPerRecord = mpr)
      assert(Warc.warcFiles(spark, glob).filter(col("parse_ok"))
        .count() == 20)
      dir
    }
    // member-per-record pays one gzip header/trailer + dictionary
    // reset per ROW — strictly bigger on disk than the shared-stream
    // layout over identical records (the price of per-record
    // compressed-offset addressability)
    assert(sizeOf(dirs(1)) > sizeOf(dirs(0)))
  }
}
