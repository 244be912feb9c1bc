package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway 1x/10x/100x probe for the round-12 crawl-ingest path
  * (not library surface): Warc.warcRecords + html_to_text over
  * byte-built two-record WARC payloads (warcinfo + an ~1.2 KB HTML
  * response), plain and member-per-record gzip. Map-only flatMap +
  * codegen projection — wall must stay linear in payload count.
  * Gen-only baselines isolate fixture construction (built inside the
  * timed region), mirroring R12ObjStmScaleProbe. */
object R12WarcScaleProbe {
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
      println(f"$label%-32s $med%8.3f s   rows=${runs.head._2}")
    }

    val filler = "lorem ipsum dolor sit amet " * 40
    def warc(id: Long, gzip: Boolean): Array[Byte] = {
      val html = s"<html><head><title>Doc $id</title></head><body>" +
        s"<h1>Doc $id</h1><p>$filler</p></body></html>"
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        html
      val rec1 = "WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
        "Content-Type: application/warc-fields\r\n" +
        "Content-Length: 18\r\n\r\nsoftware: graft/12\r\n\r\n"
      val rec2 = s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: https://example.com/doc/$id\r\n" +
        "WARC-Date: 2024-01-02T00:00:00Z\r\n" +
        "Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n" + http + "\r\n\r\n"
      val plain = (rec1 + rec2).getBytes("ISO-8859-1")
      if (!gzip) plain
      else {
        def gz(b: Array[Byte]): Array[Byte] = {
          val bos = new java.io.ByteArrayOutputStream()
          val g = new java.util.zip.GZIPOutputStream(bos)
          g.write(b); g.close()
          bos.toByteArray
        }
        // member-per-record, the .warc.gz layout
        gz(rec1.getBytes("ISO-8859-1")) ++
          gz(rec2.getBytes("ISO-8859-1"))
      }
    }

    import spark.implicits._
    def corpus(n: Long, gzip: Boolean): DataFrame =
      spark.range(n).map(i => (i, warc(i, gzip)))
        .toDF("media_id", "payload")

    for ((n, tag) <- Seq((10000L, "1x"), (100000L, "10x"),
        (1000000L, "100x"))) {
      time(s"gen-only plain $tag (${n})") {
        corpus(n, gzip = false)
          .agg(sum(length(col("payload")))).collect()
        n
      }
      time(s"gen-only gzip  $tag (${n})") {
        // gzip COMPRESSION (2 members/payload) is part of fixture
        // generation, not of the reader — and it dominates: without
        // this baseline the gzip row below reads as reader cost
        corpus(n, gzip = true)
          .agg(sum(length(col("payload")))).collect()
        n
      }
      time(s"warc+html plain $tag (${n})") {
        graft.llm.Warc.warcRecords(corpus(n, gzip = false))
          .filter(col("warc_type") === "response")
          .select(graft.plans.HtmlTextExpr.htmlToText(
            col("body").cast("string")).as("t"))
          .agg(sum(length(col("t")))).collect()
        n
      }
      time(s"warc+html gzip  $tag (${n})") {
        graft.llm.Warc.warcRecords(corpus(n, gzip = true))
          .filter(col("warc_type") === "response")
          .select(graft.plans.HtmlTextExpr.htmlToText(
            col("body").cast("string")).as("t"))
          .agg(sum(length(col("t")))).collect()
        n
      }
    }
    spark.stop()
  }
}
