package graft.tools

import graft.Tables
import graft.operators.{Graph, Joins}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway 1x/10x probes for the round-9 late batch (not library
  * surface): the join-cardinality preflight vs the join it predicts,
  * label propagation, and the bounded-heap top-k UDAF vs the window
  * form it replaces. lineitem replicates 10x with shifted orderkeys —
  * per-key multiplicity structure repeats instead of merging, and the
  * co-purchase graph's edge set is shared across replicas (same
  * partkeys), so the LPA probe measures the edge-build + dedup path's
  * growth, which dominates its cost. */
object R9LateOpsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val liPath = "/tmp/scale10x_li/lineitem.parquet"
    if (!new java.io.File(liPath).exists()) {
      val li = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
      (0 until 10).map(i =>
          li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(liPath)
    }
    val li1 = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    val li10 = spark.read.parquet(liPath)

    def time(label: String)(f: => DataFrame): Unit = {
      if (args.nonEmpty && !args.exists(label.contains)) return
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"$label%-36s $med%8.3f s   rows=${runs.head._2}")
    }

    val evPath = "/tmp/scale10x_events/events.parquet"
    if (!new java.io.File(evPath).exists()) {
      val e = Tables.load(spark, "/root/testdata/sf0.1", "events")
      (0 until 10).map(i =>
          e.withColumn("event_id", col("event_id") + lit(i * 10000000L))
            .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 31} DAYS")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(evPath)
    }
    val e1 = Tables.load(spark, "/root/testdata/sf0.1", "events")
    val e10 = spark.read.parquet(evPath)
    for ((tag, e) <- Seq("1x" -> e1, "10x" -> e10)) {
      val lbl = col("event_type") === "purchase"
      time(s"auc $tag") {
        graft.operators.Aggregates.auc(e, lbl, col("value"))
      }
      time(s"prCurve $tag") {
        graft.operators.Aggregates.prCurve(e, lbl, col("value"))
      }
      time(s"calibrationBins $tag") {
        graft.operators.Aggregates.calibrationBins(e, lbl, col("value"))
      }
      time(s"ewma $tag") {
        graft.operators.Sessions.ewma(
          e.select("user_id", "ts", "event_id", "value"),
          "user_id", Seq("ts", "event_id"), "value", 0.25)
      }
    }

    for ((tag, li) <- Seq("1x" -> li1, "10x" -> li10)) {
      // the preflight vs the self-join it sizes (≈49 out-rows/key)
      time(s"joinCardinality(self) $tag") {
        Joins.joinCardinality(li, col("l_orderkey"), li, col("l_orderkey"))
      }
      time(s"materialized self-join $tag") {
        li.select("l_orderkey")
          .join(li.select(col("l_orderkey")), "l_orderkey")
      }
      time(s"joinBlowupKeys $tag") {
        Joins.joinBlowupKeys(li, col("l_orderkey"), li,
          col("l_orderkey"), 10)
      }
      // bounded-heap UDAF vs the window form it replaces
      val rev = li.groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(round(sum(col("l_extendedprice")), 2).as("revenue"))
      time(s"topK UDAF $tag") {
        rev.groupBy(col("l_suppkey"))
          .agg(graft.functions.TopKAgg.topK(3, col("revenue"),
            col("l_partkey")).as("__top"))
          .select(col("l_suppkey"), explode(col("__top")).as("__t"))
      }
      time(s"topK window $tag") {
        rev.withColumn("__rk", row_number().over(Window
            .partitionBy("l_suppkey")
            .orderBy(col("revenue").desc, col("l_partkey"))))
          .filter(col("__rk") <= 3)
      }
      time(s"frequentTriples $tag") {
        // brand baskets; replicas shift l_orderkey so basket counts
        // scale 10x while the item vocabulary stays 25 brands
        val bi = li.join(
            Tables.load(spark, "/root/testdata/sf0.1", "part")
              .select("p_partkey", "p_brand"),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
        graft.operators.Aggregates.frequentTriples(
          bi, "basket", "item", 0.0035)
      }
      // LPA on the urgent co-purchase graph (edge build dominates)
      time(s"labelPropagation $tag") {
        val ur = Tables.load(spark, "/root/testdata/sf0.1", "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey")
        // replicas shift l_orderkey by i*10^7; mod recovers the
        // original key so every replica joins its urgent orders
        val base = li.join(ur,
            (col("l_orderkey") % 10000000L) === col("o_orderkey"))
          .select(col("l_orderkey").as("__ok"), col("l_partkey").as("__pk"))
        val pairs = base.join(
            base.select(col("__ok"), col("__pk").as("__pk2")), Seq("__ok"))
          .filter(col("__pk") < col("__pk2"))
          .select(col("__pk").as("id_a"), col("__pk2").as("id_b"))
        Graph.labelPropagation(pairs, 3)
      }
    }
    spark.stop()
  }
}
