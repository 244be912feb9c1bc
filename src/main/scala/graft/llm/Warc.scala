package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) record reader — the container format
  * crawl corpora arrive in (Common-Crawl-style .warc / .warc.gz), and
  * the front door between "a directory of crawl dumps" and the
  * engine's HTML ingest kernels ([[graft.plans.HtmlText]],
  * [[graft.streaming.HtmlIngest]]).
  *
  * Byte-level parser in the probePdf discipline (no WARC library, no
  * regex): bounded scans, explicit caps, and truncation or
  * malformation rejects the RECORD (and, because WARC framing is
  * length-prefixed, the unreachable tail) rather than misreading
  * across a record boundary. Gzip payloads decode through
  * java.util.zip — including the member-per-record concatenated
  * layout .warc.gz uses (GZIPInputStream consumes successive
  * members).
  *
  * Scale shape of the DataFrame face: flatMap only — payload bytes
  * never shuffle, one output row per record carrying the (typically
  * small) body; cost is O(bytes) per partition with no driver term.
  */
object Warc {

  /** Caps: a crafted payload must bound memory, not the JVM. */
  private val maxRecords = 65536
  private val maxHeaderBlock = 32 << 10
  private val maxBody = 256 << 20
  private val maxGunzip = 512L << 20

  final case class WarcRec(
      recType: String, targetUri: String, date: String,
      contentType: String, httpStatus: Option[Int], body: Array[Byte],
      httpContentType: String = null,
      httpContentEncoding: String = null, payloadDigest: String = null,
      recordId: String = null, concurrentTo: String = null,
      httpLocation: String = null, refersTo: String = null,
      httpLastModified: String = null, httpEtag: String = null,
      httpCacheControl: String = null)

  private def bFind(b: Array[Byte], s: String, from: Int, to: Int): Int = {
    val n = s.length
    val lim = math.min(to, b.length) - n
    var i = math.max(0, from)
    while (i <= lim) {
      var j = 0
      while (j < n && b(i + j) == s.charAt(j)) j += 1
      if (j == n) return i
      i += 1
    }
    -1
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Bounded multi-member gunzip; None on corruption or cap breach.
    * Buffers are sized to the INPUT (typical web records are a few
    * KB): a fixed 64 KB scratch per payload measured ~20x the
    * steady-state wall on a 1M-payload corpus purely in allocation/GC
    * churn. */
  private[graft] def gunzip(b: Array[Byte]): Option[Array[Byte]] = {
    var in: java.util.zip.GZIPInputStream = null
    try {
      in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b),
        math.max(512, math.min(b.length, 32 << 10)))
      // web content compresses ~3-5x; start there and let BAOS grow
      val out = new java.io.ByteArrayOutputStream(
        math.min(maxGunzip, b.length.toLong * 4).toInt)
      val buf = new Array[Byte](math.max(1024, math.min(b.length * 4,
        64 << 10)))
      var n = in.read(buf)
      var total = 0L
      while (n >= 0 && total <= maxGunzip) {
        out.write(buf, 0, n)
        total += n
        n = in.read(buf)
      }
      if (total > maxGunzip) None else Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
    // close() releases the NATIVE zlib inflater NOW: leaving it to
    // finalization measured >20x the wall on a 1M-payload corpus
    // (millions of un-freed native inflaters + finalizer backlog)
    finally if (in != null)
      try in.close() catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Header block [from, end): case-insensitive `Name:` scan bounded
    * to the block; value trimmed to the line end. Null when absent.
    * The name must start a LINE (offset `from` or preceded by \n) so
    * a value containing "uri:" never satisfies a header lookup. */
  private def header(b: Array[Byte], name: String, from: Int,
      end: Int): String = {
    val needle = name.toLowerCase(java.util.Locale.ROOT) + ":"
    val n = needle.length
    var i = from
    while (i + n <= end) {
      if (i == from || b(i - 1) == '\n') {
        var j = 0
        while (j < n && Character.toLowerCase((b(i + j) & 0xff).toChar)
          == needle.charAt(j)) j += 1
        if (j == n) {
          var s = i + n
          while (s < end && (b(s) == ' ' || b(s) == '\t')) s += 1
          var e = s
          while (e < end && b(e) != '\r' && b(e) != '\n') e += 1
          return new String(b, s, e - s, "ISO-8859-1")
        }
      }
      i += 1
    }
    null
  }

  /** Transfer-Encoding: chunked decode (RFC 9112 §7.1) — size line
    * in hex (chunk extensions after ';' dropped), CRLF, data, CRLF,
    * repeated until a zero chunk; the trailer section is ignored.
    * Chunked is TRANSPORT framing (unlike Content-Encoding, which is
    * content representation), so [[liftHttp]] undoes it
    * transparently: the body column a consumer sees is the payload,
    * not the wire framing. Null on any framing violation or cap
    * breach — the caller then keeps the RAW body (reject the
    * transform, never lose the bytes). */
  private[graft] def dechunk(b: Array[Byte]): Array[Byte] = {
    try {
      val n = b.length
      val out = new java.io.ByteArrayOutputStream(math.min(n, 64 << 10))
      var i = 0
      while (true) {
        var size = 0L
        var d = 0
        var j = i
        var ok = true
        while (ok && j < n) {
          val v = Character.digit((b(j) & 0xff).toChar, 16)
          if (v < 0) ok = false
          else {
            size = size * 16 + v
            j += 1
            d += 1
            if (d > 8) return null // > 4 GB chunk: junk
          }
        }
        if (d == 0) return null // no hex digits where a size belongs
        // optional chunk extension: runs to the CR
        while (j < n && b(j) != '\r') j += 1
        if (j + 1 >= n || b(j) != '\r' || b(j + 1) != '\n') return null
        j += 2
        if (size == 0) {
          // FULL-BODY CONSUMPTION (r14): the zero-chunk terminator —
          // plus an optional trailer section — must land exactly at
          // the body end, or this was not chunked framing at all.
          // Some archives retain the Transfer-Encoding header over an
          // already-decoded body; without this check a body whose
          // leading bytes coincidentally validate as chunk framing
          // would be silently garbled instead of kept raw.
          if (j == n) return out.toByteArray // "0\r\n" at end
          var k = j
          while (k + 1 < n) {
            if (b(k) == '\r' && b(k + 1) == '\n')
              return if (k + 2 == n) out.toByteArray else null
            var e = k // skip one trailer field line
            while (e < n && b(e) != '\r') e += 1
            if (e + 1 >= n || b(e + 1) != '\n') return null
            k = e + 2
          }
          return null // residual bytes with no trailer terminator
        }
        if (size > maxBody || out.size.toLong + size > maxBody ||
          j + size + 2 > n) return null
        out.write(b, j, size.toInt)
        j += size.toInt
        if (b(j) != '\r' || b(j + 1) != '\n') return null
        i = j + 2
      }
      null // unreachable
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** An application/http record's body is an HTTP message: lift the
    * status code, the HTTP Content-Type (where the charset param
    * lives — [[graft.plans.DecodeBodyUtil]] consumes it) and the
    * Content-Encoding (gzip bodies are the WEB's wire default —
    * [[graft.plans.BytesCodecExpr.gunzipBytes]] undoes it
    * downstream), keep only the message body — de-chunked first when
    * the message declares Transfer-Encoding: chunked (transport
    * framing; a malformed chunk stream keeps the raw body). Non-http
    * records pass through untouched. */
  /** What [[liftHttp]] recovers from an application/http record:
    * status + de-framed payload + the headers the pipeline feeds on
    * (content/redirect/cache metadata). Non-HTTP records pass
    * through with all-null headers. */
  private final case class HttpLift(status: Option[Int],
      payload: Array[Byte], ct: String, ce: String, loc: String,
      lastMod: String, etag: String, cacheCtl: String)

  private def liftHttp(warcCt: String, body: Array[Byte]): HttpLift = {
    if (warcCt != null && warcCt.startsWith("application/http") &&
        bFind(body, "HTTP/", 0, 5) == 0) {
      val he = bFind(body, "\r\n\r\n", 0, body.length)
      val sp = bFind(body, " ", 0, math.min(body.length, 16))
      val st =
        if (sp < 0) None
        else {
          var v = 0
          var k = sp + 1
          var d = 0
          while (k < body.length && d < 3 &&
              body(k) >= '0' && body(k) <= '9') {
            v = v * 10 + (body(k) - '0'); k += 1; d += 1
          }
          if (d == 3) Some(v) else None
        }
      val httpCt =
        if (he < 0) null else header(body, "Content-Type", 0, he)
      val httpCe =
        if (he < 0) null else header(body, "Content-Encoding", 0, he)
      val httpTe =
        if (he < 0) null else header(body, "Transfer-Encoding", 0, he)
      // r14: Location is the redirect-graph edge (3xx records are a
      // large share of any real archive)
      val httpLoc =
        if (he < 0) null else header(body, "Location", 0, he)
      // r14: cache/validator headers for the recrawl scheduler
      val lastMod =
        if (he < 0) null else header(body, "Last-Modified", 0, he)
      val etag =
        if (he < 0) null else header(body, "ETag", 0, he)
      val cacheCtl =
        if (he < 0) null else header(body, "Cache-Control", 0, he)
      if (he < 0)
        HttpLift(st, Array.empty[Byte], httpCt, httpCe, httpLoc,
          lastMod, etag, cacheCtl)
      else {
        val raw = java.util.Arrays.copyOfRange(
          body, he + 4, body.length)
        val payload =
          if (httpTe != null && httpTe.toLowerCase(java.util.Locale.ROOT)
              .contains("chunked")) {
            val de = dechunk(raw)
            if (de == null) raw else de
          } else raw
        HttpLift(st, payload, httpCt, httpCe, httpLoc,
          lastMod, etag, cacheCtl)
      }
    } else HttpLift(None, body, null, null, null, null, null, null)
  }

  /** All records of one WARC payload (gunzipped first if gzip).
    * None when the payload is not WARC at all; Some(records-so-far)
    * when a malformed record truncates the walk (reject the tail,
    * keep the verified prefix). */
  private[graft] def parse(raw: Array[Byte]): Option[Seq[WarcRec]] = {
    if (raw == null || raw.length < 8) return None
    val b = if (isGzip(raw)) gunzip(raw).getOrElse(return None) else raw
    if (bFind(b, "WARC/", 0, 8) != 0) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRec]
    var pos = 0
    var walking = true
    while (walking && pos < b.length && out.length < maxRecords) {
      // skip inter-record \r\n padding
      while (pos < b.length && (b(pos) == '\r' || b(pos) == '\n')) pos += 1
      if (pos >= b.length) walking = false
      else if (bFind(b, "WARC/", pos, pos + 5) != pos) walking = false
      else {
        val hEnd0 = bFind(b, "\r\n\r\n",
          pos, math.min(b.length, pos + maxHeaderBlock))
        if (hEnd0 < 0) walking = false // unterminated header block
        else {
          val hEnd = hEnd0
          val lenStr = header(b, "Content-Length", pos, hEnd)
          val len =
            try if (lenStr == null) -1L else lenStr.trim.toLong
            catch { case _: NumberFormatException => -1L }
          if (len < 0 || len > maxBody ||
              hEnd + 4 + len > b.length) walking = false
          else {
            val bodyStart = hEnd + 4
            val body = java.util.Arrays.copyOfRange(
              b, bodyStart, bodyStart + len.toInt)
            val ct = header(b, "Content-Type", pos, hEnd)
            val h = liftHttp(ct, body)
            out += WarcRec(
              header(b, "WARC-Type", pos, hEnd),
              header(b, "WARC-Target-URI", pos, hEnd),
              header(b, "WARC-Date", pos, hEnd),
              ct, h.status, h.payload, h.ct, h.ce,
              header(b, "WARC-Payload-Digest", pos, hEnd),
              header(b, "WARC-Record-ID", pos, hEnd),
              header(b, "WARC-Concurrent-To", pos, hEnd), h.loc,
              header(b, "WARC-Refers-To", pos, hEnd),
              h.lastMod, h.etag, h.cacheCtl)
            pos = bodyStart + len.toInt
          }
        }
      }
    }
    Some(out.toSeq)
  }

  private val recFields = Seq(
    StructField("parse_ok", BooleanType),
    StructField("rec_idx", IntegerType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("http_status", IntegerType),
    StructField("body", BinaryType),
    StructField("http_content_type", StringType),
    StructField("http_content_encoding", StringType),
    StructField("payload_digest", StringType),
    // r14: fetch-pair plumbing — a request record names its response
    // (or vice versa) via WARC-Concurrent-To, keyed by WARC-Record-ID
    StructField("record_id", StringType),
    StructField("concurrent_to", StringType),
    StructField("http_location", StringType),
    // r14: WARC-Refers-To ties a derivative record (a WET-style
    // `conversion`, a `revisit`) back to the capture it was made
    // from — the provenance edge a corpus pipeline joins on
    StructField("refers_to", StringType),
    // r14: the HTTP cache/validator headers a recrawl scheduler
    // feeds on — Last-Modified/ETag make a refetch conditional
    // (If-Modified-Since / If-None-Match), Cache-Control's max-age
    // is the server's own freshness horizon
    StructField("http_last_modified", StringType),
    StructField("http_etag", StringType),
    StructField("http_cache_control", StringType))

  private val recSchema: StructType =
    StructType(StructField("media_id", LongType) +: recFields)

  private val fileSchema: StructType =
    StructType(StructField("path", StringType) +: recFields)

  /** DataFrame face: one row per WARC record (response records carry
    * the HTTP message body and status; other records their raw
    * block), or a single (id, parse_ok=false, nulls) row when the
    * payload is not WARC — INCLUDING a payload that starts with WARC
    * magic but whose first record is already malformed and yields
    * zero records (consumers filter on parse_ok; a zero-record
    * "success" would be indistinguishable from a valid archive).
    * Map-only flatMap — payloads never shuffle. */
  def warcRecords(df: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(recSchema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload =
            if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          parse(payload) match {
            case Some(recs) if recs.nonEmpty =>
              recs.zipWithIndex.map { case (w, i) =>
                Row(id, true, i, w.recType, w.targetUri, w.date,
                  w.contentType, w.httpStatus.map(Int.box).orNull,
                  w.body, w.httpContentType, w.httpContentEncoding,
                  w.payloadDigest, w.recordId, w.concurrentTo,
                  w.httpLocation, w.refersTo, w.httpLastModified,
                  w.httpEtag, w.httpCacheControl)
              }
            case _ =>
              Seq(Row(id, false, null, null, null, null, null, null,
                null, null, null, null, null, null, null, null, null,
                null, null))
          }
        }
      }(enc)
  }

  /** One record read INCREMENTALLY from an (already-decompressed)
    * WARC stream: memory is O(one record), never O(file) — the
    * decode loop behind [[warcFiles]], where a multi-GB archive must
    * not buffer (the byte-column face's maxGunzip cap exists because
    * it does). Null at EOF or on the first malformed record
    * (length-prefixed framing makes the tail unreachable — the same
    * reject-the-tail rule as [[parse]]). */
  private def readRecord(in: java.io.InputStream): WarcRec = {
    // skip inter-record \r\n padding
    var c = in.read()
    while (c == '\r' || c == '\n') c = in.read()
    if (c < 0) return null
    // header block: accumulate bytes until \r\n\r\n, capped
    val hdr = new java.io.ByteArrayOutputStream(1024)
    hdr.write(c)
    var last = c & 0xff
    var n = 1
    while (last != 0x0d0a0d0a) {
      val b = in.read()
      if (b < 0) return null // truncated header block
      hdr.write(b)
      n += 1
      if (n > maxHeaderBlock) return null
      last = (last << 8) | b
    }
    val hb = hdr.toByteArray
    if (bFind(hb, "WARC/", 0, 5) != 0) return null
    val hEnd = hb.length - 4
    val lenStr = header(hb, "Content-Length", 0, hEnd)
    val len =
      try if (lenStr == null) -1L else lenStr.trim.toLong
      catch { case _: NumberFormatException => -1L }
    if (len < 0 || len > maxBody) return null
    val body = in.readNBytes(len.toInt)
    if (body.length != len) return null // truncated body
    val ct = header(hb, "Content-Type", 0, hEnd)
    val h = liftHttp(ct, body)
    WarcRec(header(hb, "WARC-Type", 0, hEnd),
      header(hb, "WARC-Target-URI", 0, hEnd),
      header(hb, "WARC-Date", 0, hEnd), ct, h.status, h.payload,
      h.ct, h.ce, header(hb, "WARC-Payload-Digest", 0, hEnd),
      header(hb, "WARC-Record-ID", 0, hEnd),
      header(hb, "WARC-Concurrent-To", 0, hEnd), h.loc,
      header(hb, "WARC-Refers-To", 0, hEnd),
      h.lastMod, h.etag, h.cacheCtl)
  }

  /** File-level front door: every `.warc` / `.warc.gz` file under
    * `path` (directory or glob) decoded to one row per record —
    * STREAMING. Gzip decodes incrementally through GZIPInputStream
    * (which consumes the member-per-record concatenated layout), so
    * a multi-GB archive costs O(one record) of memory per task and
    * the byte-column face's maxGunzip cap never applies here. Files
    * ship as lazily-opened PortableDataStream handles (binaryFiles),
    * one stream per task — record bytes never shuffle, and caps
    * bound each RECORD, not the file.
    *
    * A file that is not WARC (or whose first record is malformed)
    * yields a single (path, parse_ok=false, nulls) row; a malformed
    * record mid-file keeps the verified prefix and drops the
    * unreachable tail, like [[parse]]. Streams close eagerly at
    * EOF/error AND on task completion (native zlib inflaters must
    * not wait for finalization — measured >7x on a 1M-payload
    * corpus). */
  def warcFiles(spark: org.apache.spark.sql.SparkSession, path: String,
      minPartitions: Int = 0): DataFrame = {
    val sc = spark.sparkContext
    // binaryFiles packs whole files into splits by their COMPRESSED
    // size (CombineFileInputFormat), so a directory of gzip archives
    // — small on disk, expensive to decode — collapses into one or
    // two tasks and the cluster idles: the r14 probe measured 64
    // archives / 1M records decoding in ONE task at 8.2 s where the
    // same decode spread over 32 goes at ~1 s. The handles are lazy
    // (open() happens per task), so repartitioning them is a shuffle
    // of paths, not bytes — spread them to the requested parallelism
    // whenever the input format under-split. The cost is HDFS
    // locality on the reopened streams; archive corpora live on
    // object stores where that locality is fiction anyway.
    val target =
      if (minPartitions > 0) minPartitions else sc.defaultParallelism
    val raw =
      if (minPartitions > 0) sc.binaryFiles(path, minPartitions)
      else sc.binaryFiles(path)
    val files =
      if (raw.getNumPartitions < target) raw.repartition(target) else raw
    val rows = files.flatMap { case (file, pds) =>
      rowIterator(file, () => pds.open())
    }
    spark.createDataFrame(rows, fileSchema)
  }

  /** Archive WRITER — the inverse of [[warcFiles]]: a binary payload
    * column (one serialized WARC record, or a concatenation of
    * records, per row) written out as a directory of `.warc.gz`
    * archives, one archive per output partition. With
    * `memberPerRecord=false` the whole partition shares a single
    * gzip stream; with `true` every ROW becomes its own gzip member
    * — decoded bytes are identical either way (gzip members
    * concatenate, and [[warcFiles]]' streaming reader consumes both
    * layouts), but member-per-record is the Common Crawl layout that
    * keeps each record independently addressable by compressed byte
    * offset (the reason CDX carries an offset column), at a
    * per-record header+trailer size cost.
    *
    * Scale shape: a distributed foreachPartition write, O(one
    * record) memory per task, no driver term; `parts` bounds both
    * the archive count and the write parallelism. Existing files in
    * `dir` are removed first, so repeated runs never double records.
    * Returns the glob [[warcFiles]] reads back. */
  def writeArchiveDir(df: DataFrame, payloadCol: String, dir: String,
      parts: Int = 8, memberPerRecord: Boolean = false): String = {
    val d = new java.io.File(dir)
    if (d.exists) d.listFiles.foreach(f => { f.delete(); () })
    d.mkdirs()
    val dirPath = d.getAbsolutePath
    df.select(col(payloadCol)).repartition(parts).rdd
      .foreachPartition { it =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val f = new java.io.File(dirPath, f"part-$pid%05d.warc.gz")
          val base = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(f), 64 << 10)
          if (memberPerRecord)
            try it.foreach { r =>
              val g = new java.util.zip.GZIPOutputStream(base)
              g.write(r.getAs[Array[Byte]](0))
              g.finish()
            } finally base.close()
          else {
            val g = new java.util.zip.GZIPOutputStream(base)
            try it.foreach(r => g.write(r.getAs[Array[Byte]](0)))
            finally g.close()
          }
        }
      }
    dirPath + "/*.warc.gz"
  }

  /** The shared per-file decode walk behind [[warcFiles]] and
    * [[warcContentRecords]]: magic-sniffed optional gzip over the
    * opened stream, one [[readRecord]] at a time, the same
    * bad-file / reject-the-tail rows — so the streaming twin's rows
    * match the batch front door's BY CONSTRUCTION. */
  private def rowIterator(key: String,
      open: () => java.io.InputStream): Iterator[Row] =
    new scala.collection.AbstractIterator[Row] {
      private var closed = false
      private var emittedBad = false
      private val in: java.io.InputStream =
        try {
          val buf = new java.io.BufferedInputStream(open(), 64 << 10)
          buf.mark(2)
          val b0 = buf.read()
          val b1 = buf.read()
          buf.reset()
          if (b0 == 0x1f && b1 == 0x8b)
            new java.io.BufferedInputStream(
              new java.util.zip.GZIPInputStream(buf, 32 << 10), 64 << 10)
          else buf
        } catch { case scala.util.control.NonFatal(_) => null }
      private def close(): Unit = if (!closed) {
        closed = true
        if (in != null)
          try in.close()
          catch { case scala.util.control.NonFatal(_) => () }
      }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => close()))
      private def fetch(): WarcRec =
        if (in == null) null
        else
          try {
            val r = readRecord(in)
            if (r == null) close()
            r
          } catch {
            case scala.util.control.NonFatal(_) => close(); null
          }
      private var idx = 0
      private var rec: WarcRec = fetch()
      override def hasNext: Boolean =
        rec != null || (idx == 0 && !emittedBad)
      override def next(): Row =
        if (rec == null) {
          emittedBad = true
          Row(key, false, null, null, null, null, null, null, null,
            null, null, null, null, null, null, null, null, null,
            null)
        } else {
          val w = rec
          rec = fetch()
          val r = Row(key, true, idx, w.recType, w.targetUri, w.date,
            w.contentType, w.httpStatus.map(Int.box).orNull, w.body,
            w.httpContentType, w.httpContentEncoding,
            w.payloadDigest, w.recordId, w.concurrentTo,
            w.httpLocation, w.refersTo, w.httpLastModified,
            w.httpEtag, w.httpCacheControl)
          idx += 1
          r
        }
    }

  /** Content-column face (r14): decode a (path, content) frame —
    * the shape `binaryFile` sources produce, batch OR streaming — to
    * the same per-record rows as [[warcFiles]], through the same
    * [[rowIterator]] walk. This is what makes the STREAMING twin
    * possible: `readStream.format("binaryFile")` ships whole-file
    * content, and this map-only flatMap turns each micro-batch into
    * records with zero streaming state.
    *
    * Memory is O(file) per row by the source's design (the content
    * column is materialized) — size landing archives accordingly;
    * the multi-GB-archive path is [[warcFiles]], whose PDS streams
    * stay O(record). */
  def warcContentRecords(df: DataFrame, pathCol: String = "path",
      contentCol: String = "content"): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(fileSchema)
    df.select(col(pathCol).cast("string"), col(contentCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val key = if (r.isNullAt(0)) "" else r.getString(0)
          if (r.isNullAt(1))
            Iterator(Row(key, false, null, null, null, null, null,
              null, null, null, null, null, null, null, null))
          else {
            val bytes = r.getAs[Array[Byte]](1)
            rowIterator(key, () => new java.io.ByteArrayInputStream(bytes))
          }
        }
      }(enc)
  }
}
