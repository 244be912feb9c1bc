package graft.tools

import graft.Tables
import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 probe (not library surface): the corpus-state contract of
  * incremental ingest dedup — state BUILD cost should scale with the
  * corpus (one scan), per-BATCH cost against prebuilt state should be
  * corpus-size-independent, and absorbing an accepted batch
  * ([[Dedup.extendCorpusDedupState]]) should be batch-sized. Uses the
  * same 10x key-shifted replica corpus as the other scale probes. */
object R5DedupStateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val tenxPath = "/tmp/scale10x/documents.parquet"
    if (!new java.io.File(tenxPath).exists()) {
      val d = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      (0 until 10).map(i =>
          d.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(tenxPath)
      println("wrote 10x documents")
    }
    val d1 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val d10 = Tables.load(spark, "/tmp/scale10x", "documents")
    val batch = d1.filter(col("doc_id") >= 400 && col("doc_id") < 600)
      .localCheckpoint()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val st1 = time("state build        corpus=5k")(
      Dedup.buildCorpusDedupState(d1, "doc_id", "text"))
    val st10 = time("state build        corpus=50k")(
      Dedup.buildCorpusDedupState(d10, "doc_id", "text"))
    for (pass <- 1 to 2) {
      println(s"--- pass $pass (batch=200 docs, prebuilt state)")
      time("batch dedup        corpus=5k") {
        Dedup.incrementalDedupWithState(batch, st1, "doc_id", "text").count()
        Dedup.releaseCaches()
      }
      time("batch dedup        corpus=50k") {
        Dedup.incrementalDedupWithState(batch, st10, "doc_id", "text").count()
        Dedup.releaseCaches()
      }
    }
    time("state extend +200  corpus=5k")(
      Dedup.extendCorpusDedupState(st1, batch, "doc_id", "text"))
    time("state extend +200  corpus=50k")(
      Dedup.extendCorpusDedupState(st10, batch, "doc_id", "text"))
    spark.stop()
  }
}
