package graft.tools

import graft.Tables
import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Throwaway 10x candidate-scaling probe for the banded hyperplane LSH
  * (not part of the library surface). Candidates are counted by running
  * the op with no cosine floor (minCosine = -1 keeps every candidate
  * pair the bands emit). */
object BandScaleProbe {
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
      println(f"$label%-52s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }

    val e1 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val e10 = Tables.load(spark, "/tmp/scale10x", "embeddings")
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      // defaults (16x12): the designed near-dup regime
      time("sf0.1  (2k)  candidates 16x12")(
        Dedup.embeddingNearDups(e1, "vec_id", "embedding", -1.0))
      time("10x    (20k) candidates 16x12")(
        Dedup.embeddingNearDups(e10, "vec_id", "embedding", -1.0))
      time("sf0.1  (2k)  neardups@0.95 16x12")(
        Dedup.embeddingNearDups(e1, "vec_id", "embedding", 0.95))
      time("10x    (20k) neardups@0.95 16x12")(
        Dedup.embeddingNearDups(e10, "vec_id", "embedding", 0.95))
      // the graded low-threshold setting (16x4): documented non-pruning regime
      time("sf0.1  (2k)  candidates 16x4")(
        Dedup.embeddingNearDups(e1, "vec_id", "embedding", -1.0, 16, 4))
      time("10x    (20k) candidates 16x4")(
        Dedup.embeddingNearDups(e10, "vec_id", "embedding", -1.0, 16, 4))
    }
    spark.stop()
  }
}
