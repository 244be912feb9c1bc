package graft.tools

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway round-4 scale probe (not library surface): the corpus
  * mixing family at 1x vs 10x, and the two-phase tokenBudgetSelect
  * against the naive global-ordered window it replaces. */
object MixScaleProbe {
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

    val d1 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val d10 = Tables.load(spark, "/tmp/scale10x", "documents")

    def naiveBudget(docs: DataFrame, budget: Long): DataFrame =
      docs.select(col("doc_id"),
          Text.qualityScore(col("text")).as("quality"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("cum", sum("n_tokens").over(
          Window.orderBy(col("quality").desc, col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum") <= budget)

    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      time("tokenBudget naive window    5k docs")(
        naiveBudget(d1, 100000L))
      time("tokenBudget two-phase       5k docs")(
        graft.llm.Mixing.tokenBudgetSelect(d1, "text", "doc_id", 100000L))
      time("tokenBudget naive window   50k docs")(
        naiveBudget(d10, 1000000L))
      time("tokenBudget two-phase      50k docs")(
        graft.llm.Mixing.tokenBudgetSelect(d10, "text", "doc_id", 1000000L))
      time("temperatureResample         5k docs")(
        graft.llm.Mixing.temperatureResample(d1, "source",
          col("doc_id"), 0.3, 0.5))
      time("temperatureResample        50k docs")(
        graft.llm.Mixing.temperatureResample(d10, "source",
          col("doc_id"), 0.3, 0.5))
      time("jsDivergence                5k docs")(
        graft.llm.Mixing.jsDivergence(
          d1.filter(col("lang") === "en"), d1.filter(col("lang") === "zh"),
          "text"))
      time("jsDivergence               50k docs")(
        graft.llm.Mixing.jsDivergence(
          d10.filter(col("lang") === "en"), d10.filter(col("lang") === "zh"),
          "text"))
      time("shuffleShards               5k docs")(
        graft.llm.Mixing.shuffleShards(d1.select("doc_id"),
          col("doc_id"), 8))
      time("shuffleShards              50k docs")(
        graft.llm.Mixing.shuffleShards(d10.select("doc_id"),
          col("doc_id"), 8))
      time("qualityPercentileFilter     5k docs")(
        graft.llm.Mixing.qualityPercentileFilter(
          d1, "text", "doc_id", "source", 0.5))
      time("qualityPercentileFilter    50k docs")(
        graft.llm.Mixing.qualityPercentileFilter(
          d10, "text", "doc_id", "source", 0.5))
      time("epochPlan+materialize       5k docs")(
        graft.llm.Mixing.materializeEpochs(d1,
          graft.llm.Mixing.epochPlan(d1, "source", "text", 0.3, 500000L),
          "source", col("doc_id")))
      time("epochPlan+materialize      50k docs")(
        graft.llm.Mixing.materializeEpochs(d10,
          graft.llm.Mixing.epochPlan(d10, "source", "text", 0.3, 5000000L),
          "source", col("doc_id")))
    }
    spark.stop()
  }
}
