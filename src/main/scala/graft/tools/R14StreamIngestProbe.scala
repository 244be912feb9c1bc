package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway scale probe for the round-14 STREAMING archive twin
  * (not library surface): the same directories of real .warc.gz
  * files as R13WarcFilesProbe, driven three ways —
  *   1. batch `warcFiles` (the r13 baseline, PDS streams);
  *   2. batch `binaryFile` scan -> `warcContentRecords` (the exact
  *      per-batch work a streaming micro-batch performs);
  *   3. a LIVE file-drop stream (`WarcIngest.warcDirRecords` ->
  *      memory sink, processAllAvailable) — end-to-end including the
  *      file-source listing/offset-log overhead.
  * The twin's claim is "ingest = scan throughput, zero streaming
  * state": (2) must track (1) within the content-materialization
  * cost, and (3) must track (2) within the source bookkeeping. */
object R14StreamIngestProbe {
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
      println(f"$label%-40s $med%8.3f s   rows=${runs.head._2}")
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
        .createTempDirectory("r14warc").toString
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

    for ((k, tag) <- Seq((1600, "10x (100k recs)"),
        (16000, "100x (1M recs)"))) {
      val dir = writeDir(64, k)
      time(s"1 warcFiles        $tag") {
        graft.llm.Warc.warcFiles(spark, dir)
          .filter(col("warc_type") === "response")
          .agg(sum(length(col("body")))).collect()
        64L * k
      }
      time(s"2 contentRecords   $tag") {
        graft.llm.Warc.warcContentRecords(
            spark.read.format("binaryFile").load(dir))
          .filter(col("warc_type") === "response")
          .agg(sum(length(col("body")))).collect()
        64L * k
      }
      time(s"3 live stream      $tag") {
        val ck = java.nio.file.Files
          .createTempDirectory("r14ck").toString
        val name = "probe_" + math.abs(dir.hashCode).toString
        val q = graft.streaming.WarcIngest
          .warcDirRecords(spark, dir, maxFilesPerTrigger = 16)
          .filter(col("warc_type") === "response")
          .select(col("path"), length(col("body")).as("n"))
          .writeStream.format("memory").queryName(name)
          .option("checkpointLocation", ck)
          .outputMode("append").start()
        q.processAllAvailable()
        val n = spark.table(name).count()
        q.stop()
        spark.catalog.dropTempView(name)
        n
      }
    }
    spark.stop()
  }
}
