package graft.tools

import graft.Tables
import graft.llm.{Dedup, LanguageModel}
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

    def time(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.count()
      println(f"$label%-38s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }

    val out = "/tmp/scale10x"
    def docs10 = Tables.load(spark, out, "documents")
    def docs1 = Tables.load(spark, "/root/testdata/sf0.1", "documents")

    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      time("sf0.1  allpairs 0.8")(
        Dedup.ngramJaccardPairs(docs1, "doc_id", "text", 3, 0.8))
      time("sf0.1  prefix   0.8")(
        Dedup.similarityJoin(docs1, "doc_id", "text", 3, 0.8))
      time("10x    prefix   0.8")(
        Dedup.similarityJoin(docs10, "doc_id", "text", 3, 0.8))
      time("10x    contamination(<50 vs rest)")(
        Dedup.contamination(docs10.filter(col("doc_id") < 50),
          docs10.filter(col("doc_id") >= 50), "doc_id", "text", 3))
      time("10x    unigram logprob")(
        LanguageModel.unigramScore(docs10, "doc_id", "text"))
    }
    println("one-off: 10x allpairs 0.8 for the ratio")
    time("10x    allpairs 0.8")(
      Dedup.ngramJaccardPairs(docs10, "doc_id", "text", 3, 0.8))
    spark.stop()
  }
}
