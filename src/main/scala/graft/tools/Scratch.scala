package graft.tools

import graft.Tables
import graft.functions.Text
import graft.llm.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage profiler (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }

    def docs = Tables.load(spark, sfDir, "documents")

    // dedup_corpus stage split
    def exactKeep = Dedup.exact(docs, "doc_id", "text")
      .select(col("canonical_id").as("doc_id"))
    def exactKept = docs.join(exactKeep, Seq("doc_id"), "left_semi")
    def sig = Dedup.signatureFrame(exactKept, "doc_id", "text", 3, 32)

    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      time("exact agg")(exactKeep)
      time("exactKept semi")(exactKept)
      time("sig (tok+minhash)")(sig)
      time("minhash_clusters(kept)")(
        Dedup.minhashClusters(exactKept, "doc_id", "text"))
      time("dedup_corpus full")(
        Dedup.dedupCorpus(docs, "doc_id", "text").select(col("doc_id")))
      time("simhash_frame")(Dedup.simhashFrame(docs, "doc_id", "text"))
      time("simhash_near_dups")(
        Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 6))
    }
    spark.stop()
  }
}
