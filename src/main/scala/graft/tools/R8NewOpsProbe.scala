package graft.tools

import graft.Tables
import graft.etl.Layout
import graft.llm.Pii
import graft.operators.Sessions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway 10x scale probes for the round-8 additions (not library
  * surface): PII masking/report, sessionization, funnel, and z-order
  * slicing. Events are replicated 10x with shifted event ids and a
  * +31-day time offset per replica (so per-user session structure
  * repeats rather than merging); the expectation is near-flat walls —
  * every operator is map-only or a single per-key window pass. */
object R8NewOpsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val tenxPath = "/tmp/scale10x_events/events.parquet"
    if (!new java.io.File(tenxPath).exists()) {
      val e = Tables.load(spark, "/root/testdata/sf0.1", "events")
      (0 until 10).map(i =>
          e.withColumn("event_id", col("event_id") + lit(i * 10000000L))
            .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 31} DAYS")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(tenxPath)
      println("wrote 10x events")
    }
    val e1 = Tables.load(spark, "/root/testdata/sf0.1", "events")
    val e10 = Tables.load(spark, "/tmp/scale10x_events", "events")

    def time(label: String)(f: => DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"$label%-36s $med%8.3f s   rows=${runs.head._2}")
    }

    for ((tag, e) <- Seq("1x" -> e1, "10x" -> e10)) {
      val corpus = e.select(col("event_id"),
        concat(lit("u"), col("user_id").cast("string"), lit("@ex.com ip 10.0.0."),
          (col("user_id") % 250).cast("string"), lit(" badge "),
          lpad((col("event_id") % 100000000).cast("string"), 9, "0")).as("text"))
      // checksum agg: .count() alone would let Catalyst prune the
      // mask projection away entirely
      time(s"pii mask $tag") {
        Pii.maskDocs(corpus, "text")
          .agg(sum(length(col("text"))).as("chk"))
      }
      time(s"pii report $tag") { Pii.report(corpus, "text") }
      time(s"sessionStats $tag") {
        Sessions.sessionStats(e, "user_id", "ts", 21600,
          Seq(col("event_id")))
      }
      time(s"funnelSummary $tag") {
        Sessions.funnelSummary(e, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
      }
      time(s"zorderSlices+stats $tag") {
        Layout.partitionStats(
          Layout.zorderSlices(e.select("user_id", "value"),
            Seq("user_id", "value"), 32, bits = 8),
          Seq("value"), Some(col("__zslice")))
      }
    }

    // PageRank edge-count scaling: synthetic graphs of 200k vs 2M
    // edges (powers of the same hash construction, ~20k nodes) — the
    // per-iteration cost should scale with |E| while the checkpoint /
    // scheduling floor dominates locally
    for ((tag, m) <- Seq("200k" -> 200000L, "2M" -> 2000000L)) {
      val edges = spark.range(m).select(
        concat(lit("n"), pmod(hash(col("id")), lit(20000)).cast("string")).as("src"),
        concat(lit("n"), pmod(hash(col("id") * 31 + 7), lit(20000)).cast("string")).as("dst"),
        lit(1.0).as("weight"))
      time(s"pageRank 10 iters $tag edges") {
        graft.operators.Graph.pageRank(edges, 10, 0.85)
      }
    }
    spark.stop()
  }
}
