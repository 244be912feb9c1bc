package graft.tools

import graft.Tables
import graft.operators.Sessions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway 1x/10x/100x probe for the round-10 survival family (not
  * library surface): events replicated with shifted user ids so the
  * KEY cardinality grows with the data — the per-key label collapse
  * is the only row-cardinality stage; everything after rides the
  * cohorts × (horizon+1) grid, so wall should track the scan, flat
  * per row. */
object R10SurvivalScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val e1 = Tables.load(spark, "/root/testdata/sf0.1", "events")
    def replicate(times: Int, path: String): DataFrame = {
      if (!new java.io.File(path).exists()) {
        (0 until times).map { i =>
          e1.withColumn("user_id", col("user_id") + lit(i * 100000000L))
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(path)
      }
      spark.read.parquet(path)
    }
    val e10 = replicate(10, "/tmp/surv10x/events.parquet")
    val e100 = replicate(100, "/tmp/surv100x/events.parquet")

    def time(label: String)(f: => DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"$label%-26s $med%8.3f s   rows=${runs.head._2}")
    }

    val cohort = when(col("user_id") % 2 === 0, "even").otherwise("odd")
    for ((e, tag) <- Seq((e1, "1x"), (e10, "10x"), (e100, "100x"))) {
      time(s"kaplanMeierToEvent $tag") {
        Sessions.kaplanMeierToEvent(e, "user_id", "ts",
          col("event_type") === "purchase", 3)
      }
      time(s"logRank $tag") {
        Sessions.logRank(e, "user_id", "ts",
          col("event_type") === "purchase", cohort, 3)
      }
      time(s"coxPh $tag") {
        Sessions.coxPh(e, "user_id", "ts",
          col("event_type") === "purchase", cohort, "even", 3)
      }
    }
    spark.stop()
  }
}
