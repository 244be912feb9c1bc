package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway scale probe for the round-13 FILE-level WARC front door
  * (not library surface): writes directories of real .warc.gz files
  * (member-per-record, ~1.2 KB HTML responses) and drives
  * Warc.warcFiles -> html_to_text over them — the path a real crawl
  * corpus takes. Reported against the r12 byte-column rows for the
  * same record counts: the file path must stay linear in bytes and
  * within the same regime (it reads ONE stream per file instead of
  * pre-split payload rows, so per-file parallelism is the unit).
  * Also times a single multi-GB-uncompressed archive to demonstrate
  * the O(record) memory claim end to end. */
object R13WarcFilesProbe {
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
      println(f"$label%-36s $med%8.3f s   rows=${runs.head._2}")
    }

    val filler = "lorem ipsum dolor sit amet " * 40
    def record(id: Long): Array[Byte] = {
      val html = s"<html><head><title>Doc $id</title></head><body>" +
        s"<h1>Doc $id</h1><p>$filler</p></body></html>"
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        html
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: https://example.com/doc/$id\r\n" +
        "WARC-Date: 2024-01-02T00:00:00Z\r\n" +
        "Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n" + http + "\r\n\r\n")
        .getBytes("ISO-8859-1")
    }

    def writeDir(nFiles: Int, recsPerFile: Int): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("r13warc").toString
      var id = 0L
      (0 until nFiles).foreach { f =>
        val out = new java.util.zip.GZIPOutputStream(
          new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(
              new java.io.File(dir, f"part-$f%05d.warc.gz")), 1 << 20))
        (0 until recsPerFile).foreach { _ =>
          out.write(record(id)); id += 1
        }
        out.close()
      }
      dir
    }

    // 64 files x K records — per-file task parallelism on local[32]
    for ((k, tag) <- Seq((160, "1x  (10k recs)"),
        (1600, "10x (100k recs)"), (16000, "100x (1M recs)"))) {
      val dir = writeDir(64, k)
      time(s"warcFiles+html $tag") {
        graft.llm.Warc.warcFiles(spark, dir)
          .filter(col("warc_type") === "response")
          .select(graft.plans.HtmlTextExpr.htmlToText(
            col("body").cast("string")).as("t"))
          .agg(sum(length(col("t")))).collect()
        64L * k
      }
    }

    // one archive whose UNCOMPRESSED size (~1.2 GB) dwarfs the
    // byte-column face's 512 MB gunzip cap: must stream through
    val big = java.nio.file.Files.createTempDirectory("r13big").toString
    val bigOut = new java.util.zip.GZIPOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(
        new java.io.File(big, "big.warc.gz")), 1 << 20))
    (0 until 1000000).foreach(i => bigOut.write(record(i)))
    bigOut.close()
    time("single 1M-record archive (1 task)") {
      graft.llm.Warc.warcFiles(spark, big)
        .filter(col("parse_ok"))
        .agg(sum(length(col("body")))).collect()
      1000000L
    }
    spark.stop()
  }
}
