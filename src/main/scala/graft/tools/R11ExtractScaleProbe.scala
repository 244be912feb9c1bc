package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway 1x/10x/100x probe for the round-11 extraction kernels
  * (not library surface): html_to_text over synthetic pages and
  * extractPdfTextDf over byte-built two-page PDFs. Both are MAP-ONLY
  * (zero exchanges — PlanAudit pins the shape), so wall must be
  * linear in input bytes with no driver term; this probe is the
  * measured evidence.
  */
object R11ExtractScaleProbe {
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
      println(f"$label%-30s $med%8.3f s   rows=${runs.head._2}")
    }

    // ---- html_to_text: ~1.2 KB synthetic page per row ----
    def htmlCorpus(n: Long): DataFrame = spark.range(n)
      .select(col("id"), concat(
        lit("<!DOCTYPE html><html><head><title>t</title><style>p{x:1}" +
          "</style><script>if (1 < 2) { f(\"&amp;\"); }</script>" +
          "</head><body><h1>Doc "),
        col("id").cast("string"),
        lit("</h1><!-- c --><p class=\"a\">" + ("lorem ipsum dolor " * 40) +
          "&amp; &lt;x&gt; caf&#233;</p><div><span>tail </span>" +
          "</div><table><tr><td>k</td><td>"),
        col("id").cast("string"),
        lit("</td></tr></table></body></html>")).as("html"))

    for ((n, tag) <- Seq((20000L, "1x"), (200000L, "10x"),
        (2000000L, "100x"))) {
      time(s"html_to_text $tag (${n} pages)") {
        htmlCorpus(n)
          .select(graft.plans.HtmlTextExpr.htmlToText(col("html")).as("t"))
          .select(sum(length(col("t")))).collect()
        n
      }
    }

    // ---- extractPdfTextDf: two-page Flate PDF per row ----
    def pdf(seedText: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
      def deflate(data: Array[Byte]): Array[Byte] = {
        val d = new java.util.zip.Deflater()
        d.setInput(data); d.finish()
        val buf = new Array[Byte](4096)
        val o = new java.io.ByteArrayOutputStream()
        while (!d.finished()) o.write(buf, 0, d.deflate(buf))
        d.end(); o.toByteArray
      }
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

    import spark.implicits._
    def pdfCorpus(n: Long): DataFrame = spark.range(n)
      .map { i => (i, pdf(s"doc$i")) }.toDF("media_id", "payload")

    for ((n, tag) <- Seq((10000L, "1x"), (100000L, "10x"),
        (1000000L, "100x"))) {
      time(s"extractPdfTextDf $tag (${n} pdfs)") {
        graft.llm.Multimodal.extractPdfTextDf(pdfCorpus(n))
          .agg(sum(when(col("extract_ok"), 1).otherwise(0)),
            sum(length(col("text")))).collect()
        n
      }
    }
    spark.stop()
  }
}
