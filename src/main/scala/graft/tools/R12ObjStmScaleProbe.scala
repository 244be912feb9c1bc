package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway 1x/10x/100x probe for the round-12 ObjStm path
  * (not library surface): extractPdfTextDf over byte-built PDFs whose
  * catalog/page-tree/page dicts live inside a /Type /ObjStm
  * container (the PDF 1.5+ modern-writer layout), alongside the
  * round-11 classic layout as the no-regression baseline. Both are
  * MAP-ONLY; wall must stay linear in payload count. The ObjStm
  * variant pays one extra inflate (the container) per file — the
  * per-payload resolver cache keeps it to exactly one. */
object R12ObjStmScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"$label%-34s $med%8.3f s   rows=${runs.head._2}")
    }

    def deflate(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(data); d.finish()
      val buf = new Array[Byte](4096)
      val o = new java.io.ByteArrayOutputStream()
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end(); o.toByteArray
    }

    /** Two-page classic-xref PDF (the round-11 probe shape). */
    def pdfClassic(seedText: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
      val pages = Seq(s"BT ($seedText page one) Tj T* (line) Tj ET",
        s"BT ($seedText page two) Tj ET")
      val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
      w("%PDF-1.4\n")
      offs += bos.size
      w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
      offs += bos.size
      w("2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>\nendobj\n")
      (0 until 2).foreach { i =>
        offs += bos.size
        w(s"${3 + i} 0 obj\n<< /Type /Page /Parent 2 0 R /Contents " +
          s"${5 + i} 0 R >>\nendobj\n")
      }
      (0 until 2).foreach { i =>
        val body = deflate(pages(i).getBytes("ISO-8859-1"))
        offs += bos.size
        w(s"${5 + i} 0 obj\n<< /Length ${body.length} " +
          "/Filter /FlateDecode >>\nstream\n")
        bos.write(body); w("\nendstream\nendobj\n")
      }
      val xrefPos = bos.size
      w(s"xref\n0 ${offs.length + 1}\n0000000000 65535 f \n")
      offs.foreach(o => w(f"$o%010d 00000 n \n"))
      w(s"trailer\n<< /Size ${offs.length + 1} /Root 1 0 R >>\n" +
        s"startxref\n$xrefPos\n%%EOF")
      bos.toByteArray
    }

    /** Two-page PDF with catalog/pages/page dicts in one ObjStm. */
    def pdfObjStm(seedText: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
      val pages = Seq(s"BT ($seedText page one) Tj T* (line) Tj ET",
        s"BT ($seedText page two) Tj ET")
      val n = pages.length
      w("%PDF-1.5\n")
      val contOffs = new Array[Int](n)
      (0 until n).foreach { i =>
        val body = deflate(pages(i).getBytes("ISO-8859-1"))
        contOffs(i) = bos.size
        w(s"${3 + n + i} 0 obj\n<< /Length ${body.length} " +
          "/Filter /FlateDecode >>\nstream\n")
        bos.write(body); w("\nendstream\nendobj\n")
      }
      val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
      val inner = Seq(
        1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [$kids] /Count $n >>") ++
        (0 until n).map(i => (3 + i) ->
          s"<< /Type /Page /Parent 2 0 R /Contents ${3 + n + i} 0 R >>")
      val bodies = inner.map(_._2 + "\n")
      val rel = bodies.scanLeft(0)(_ + _.length)
      val header = inner.zipWithIndex
        .map { case ((num, _), i) => s"$num ${rel(i)}" }
        .mkString(" ") + "\n"
      val payload = (header + bodies.mkString).getBytes("ISO-8859-1")
      val defl = deflate(payload)
      val stmObj = 3 + 2 * n
      val stmOff = bos.size
      w(s"$stmObj 0 obj\n<< /Type /ObjStm /N ${inner.length} " +
        s"/First ${header.length} /Filter /FlateDecode " +
        s"/Length ${defl.length} >>\nstream\n")
      bos.write(defl)
      w("\nendstream\nendobj\n")
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

    import spark.implicits._
    def corpus(n: Long, mk: String => Array[Byte]): DataFrame =
      spark.range(n).map { i => (i, mk(s"doc$i")) }
        .toDF("media_id", "payload")

    for ((n, tag) <- Seq((10000L, "1x"), (100000L, "10x"),
        (1000000L, "100x"))) {
      // gen-only baselines: corpus construction happens INSIDE the
      // timed region (spark.range.map is re-evaluated per action), so
      // the extract timings below include it — these isolate the
      // fixture-build share (ObjStm fixtures deflate 4 streams/file
      // vs classic's 2), letting the table attribute the delta to
      // extraction honestly
      time(s"gen-only classic $tag (${n} pdfs)") {
        corpus(n, pdfClassic).agg(sum(length(col("payload"))))
          .collect()
        n
      }
      time(s"gen-only ObjStm  $tag (${n} pdfs)") {
        corpus(n, pdfObjStm).agg(sum(length(col("payload"))))
          .collect()
        n
      }
      time(s"extract classic $tag (${n} pdfs)") {
        graft.llm.Multimodal.extractPdfTextDf(corpus(n, pdfClassic))
          .agg(sum(when(col("extract_ok"), 1).otherwise(0)),
            sum(length(col("text")))).collect()
        n
      }
      time(s"extract ObjStm  $tag (${n} pdfs)") {
        graft.llm.Multimodal.extractPdfTextDf(corpus(n, pdfObjStm))
          .agg(sum(when(col("extract_ok"), 1).otherwise(0)),
            sum(length(col("text")))).collect()
        n
      }
    }
    spark.stop()
  }
}
