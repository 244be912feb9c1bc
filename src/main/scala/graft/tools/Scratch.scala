package graft.tools

import graft.Tables
import graft.functions.Text
import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage profiler (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val out = "/tmp/scale10x"
    def docs = Tables.load(spark, out, "documents")

    // candidate-pair volume by doc-freq cap, from the bucket histogram
    val shingleN = 3
    val toks = docs.select(col("doc_id").as("id"),
      split(lower(Text.normWs(col("text"))), " ").as("t"))
    val starts = when(size(col("t")) >= shingleN,
      sequence(lit(1), size(col("t")) - (shingleN - 1))).otherwise(array())
    val sh = toks
      .select(col("id"), col("t"), explode(starts).as("i"))
      .select(col("id"),
        xxhash64(concat_ws(" ", slice(col("t"), col("i"), lit(shingleN))))
          .as("shingle"))
    val dfreq = sh.groupBy("shingle").agg(count_distinct(col("id")).as("m"))
      .filter(col("m") > 1)
    dfreq.agg(
      sum(col("m") * (col("m") - 1) / 2).as("pairs_uncapped"),
      sum(when(col("m") <= 150, col("m") * (col("m") - 1) / 2)
        .otherwise(0)).as("pairs_df150"),
      max(col("m")).as("max_df"),
      count(lit(1)).as("n_buckets")).show(false)

    def time(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.count()
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }
    for (pass <- 1 to 2) {
      println(s"--- pass $pass (10x docs)")
      time("ngram 0.8 maxDocFreq=150")(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
          maxDocFreq = 150))
    }
    spark.stop()
  }
}
