package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway round-4 scale probes (not library surface): grid range
  * join under a deliberately hot key, and semanticDedup at 10x. */
object R4ScaleProbe {
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
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }

    // --- hot-key range join: EVERY row owns one key ---
    val e = Tables.load(spark, "/root/testdata/sf0.1", "events")
    val errors = e.filter(col("event_type") === "error")
      .select(lit("hot").as("k"), col("event_id").as("err_id"),
        col("ts").as("lo"), (col("ts") + expr("INTERVAL 1 HOUR")).as("hi"))
    val clicks = e.filter(col("event_type") === "click")
      .select(lit("hot").as("k"), col("ts"))
    println(s"errors=${errors.count()} clicks=${clicks.count()}")
    def naive = clicks.join(errors, "k")
      .filter(col("ts") >= col("lo") && col("ts") < col("hi"))
    def grid = graft.operators.Joins.rangeJoin(
      clicks, errors, Seq("k"), "ts", "lo", "hi")
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      time("hot-key naive (key equi-join + filter)")(naive)
      time("hot-key grid (1h cells)")(grid)
    }

    // --- incrementalDedup: fixed 200-doc batch vs growing corpus ---
    val d1 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val d10 = Tables.load(spark, "/tmp/scale10x", "documents")
    val batch = d1.filter(col("doc_id") >= 400 && col("doc_id") < 600)
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      time("incrementalDedup batch=200 corpus=5k")(
        graft.llm.Dedup.incrementalDedup(batch, d1, "doc_id", "text"))
      graft.llm.Dedup.releaseCaches()
      time("incrementalDedup batch=200 corpus=50k")(
        graft.llm.Dedup.incrementalDedup(batch, d10, "doc_id", "text"))
      graft.llm.Dedup.releaseCaches()
    }

    // --- semanticDedup 1x vs 10x ---
    val e1 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val e10 = Tables.load(spark, "/tmp/scale10x", "embeddings")
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      time("semanticDedup 2k  (nlist=16, 0.95)")(
        graft.llm.Dedup.semanticDedup(e1, "vec_id", "embedding", 0.95, 16))
      graft.llm.Dedup.releaseCaches()
      time("semanticDedup 20k (nlist=64, 0.95)")(
        graft.llm.Dedup.semanticDedup(e10, "vec_id", "embedding", 0.95, 64))
      graft.llm.Dedup.releaseCaches()
    }
    spark.stop()
  }
}
