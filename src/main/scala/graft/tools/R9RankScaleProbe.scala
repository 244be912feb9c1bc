package graft.tools

import graft.Tables
import graft.operators.Aggregates
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway 1x/10x/100x probe for the bucketed-rank family (not
  * library surface): RFM segmentation, exact weighted percentiles and
  * gini at sf0.1 and at 10x/100x row replications of orders/lineitem.
  * Replication shifts the customer/order keys so key cardinality grows
  * with the data (the regime the equi-width bucket decomposition must
  * survive — a global-window NTILE would fall over here first). */
object R9RankScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val o1 = Tables.load(spark, "/root/testdata/sf0.1", "orders")
    val l1 = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")

    def replicate(df: DataFrame, times: Int, keyCols: Seq[String],
        path: String): DataFrame = {
      if (!new java.io.File(path).exists()) {
        (0 until times).map { i =>
          keyCols.foldLeft(df)((d, k) =>
            d.withColumn(k, col(k) + lit(i * 100000000L)))
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(path)
      }
      spark.read.parquet(path)
    }
    val o10 = replicate(o1, 10, Seq("o_custkey"), "/tmp/rank10x/orders.parquet")
    val o100 = replicate(o1, 100, Seq("o_custkey"), "/tmp/rank100x/orders.parquet")
    val l10 = replicate(l1, 10, Seq("l_orderkey"), "/tmp/rank10x/lineitem.parquet")
    val l100 = replicate(l1, 100, Seq("l_orderkey"), "/tmp/rank100x/lineitem.parquet")

    def time(label: String)(f: => DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"$label%-34s $med%8.3f s   rows=${runs.head._2}")
    }

    for ((o, tag) <- Seq((o1, "1x"), (o10, "10x"), (o100, "100x"))) {
      time(s"rfmSegments $tag") {
        Aggregates.rfmSegments(o, "o_custkey", "o_orderdate",
          "o_totalprice")
      }
    }
    for ((l, tag) <- Seq((l1, "1x"), (l10, "10x"), (l100, "100x"))) {
      time(s"weightedPercentiles $tag") {
        Aggregates.weightedPercentiles(l, Seq("l_returnflag"),
          "l_extendedprice", "l_quantity")
      }
      time(s"gini $tag") {
        Aggregates.gini(l.groupBy(col("l_orderkey"))
          .agg(sum(col("l_extendedprice")).as("rev")), "rev")
      }
    }
    spark.stop()
  }
}
