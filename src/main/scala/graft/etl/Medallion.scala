package graft.etl

import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze→silver→gold batch ETL (SURVEY.md §3.2), re-expressed
  * Spark-first. Shapes follow the reference:
  *
  *  - news silver: dedup by title, parse date, microsecond-string
  *    datetime (`Deliverable_3/load_to_silver_layer.py:45-53`)
  *  - quotes silver: per-symbol `updates_<SYM>` array<struct> columns
  *    exploded, tagged with the company literal, unioned, deduped on
  *    (record_timestamp, update_timestamp, company)
  *    (`load_to_silver_layer.py:59-121`)
  *  - gold: daily aggregates + keyword explode counts
  *    (`Deliverable_4/load_to_gold_layer.py:40-64`)
  *
  * Divergences from the reference, by design:
  *  - writes are PARTITIONED by date (and symbol where natural) — the
  *    reference writes flat overwrite-world dirs; partition pruning is
  *    the main 100 TB lever for its own 14-day dashboard queries
  *  - gold lands via a batch sink, never a driver-side collect+insert
  *    loop (`load_to_gold_layer.py:76-96` is the anti-pattern)
  *  - the vectorized parquet reader stays ON; schemas are declared.
  */
object Medallion {

  /** News bronze→silver: dedup titles, typed timestamp, silver-format
    * datetime string (kept as string for reference fidelity —
    * `load_to_silver_layer.py:49` stores text). */
  def newsToSilver(bronze: DataFrame): DataFrame =
    bronze
      .dropDuplicates("title")
      .withColumn("datetime", to_timestamp(col("date"), "yyyy-MM-dd"))
      .drop("date")
      .withColumn("datetime",
        date_format(col("datetime"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))

  /** Quotes bronze→silver: explode each `updates_<SYM>` array<struct>,
    * tag the company, union by name, dedup on the composite key. The
    * reference runs 4 sequential explode+select blocks; this is the same
    * plan generalized over the symbol list. */
  def quotesToSilver(bronze: DataFrame, symbols: Seq[String]): DataFrame = {
    val perSymbol = symbols.map { sym =>
      bronze
        .select(col("timestamp").as("record_timestamp"),
          explode(col(s"updates_$sym")).as("u"))
        .select(
          col("record_timestamp"),
          col("u.timestamp").as("update_timestamp"),
          col("u.price"), col("u.volume"), col("u.volatility"),
          col("u.bid_ask_spread"), col("u.market_sentiment"),
          col("u.trading_activity"),
          lit(sym).as("company"))
    }
    Relational.unionAll(perSymbol)
      .dropDuplicates(Seq("record_timestamp", "update_timestamp", "company"))
  }

  /** Gold: news per-day/source counts. `load_to_gold_layer.py:41-43`. */
  def newsDailyCounts(silverNews: DataFrame): DataFrame =
    silverNews
      .withColumn("aggregation_date",
        to_date(col("datetime"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .groupBy("aggregation_date", "source_site")
      .agg(count(col("title")).as("article_count"))

  /** Gold: per-(date, keyword) counts via explode.
    * `load_to_gold_layer.py:45-49`. */
  def keywordDailyCounts(silverNews: DataFrame): DataFrame =
    silverNews
      .withColumn("aggregation_date",
        to_date(col("datetime"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .select(col("aggregation_date"), explode(col("keywords")).as("keyword"))
      .groupBy("aggregation_date", "keyword")
      .agg(count(lit(1)).as("keyword_count"))

  /** Gold: daily quote aggregates per company.
    * `load_to_gold_layer.py:54-64`. */
  def quotesDailyGold(silverQuotes: DataFrame): DataFrame =
    silverQuotes
      .withColumn("aggregation_date",
        to_date(timestamp_millis(col("update_timestamp"))))
      .groupBy("company", "aggregation_date")
      .agg(
        avg("price").as("avg_price"),
        max("price").as("max_price"),
        min("price").as("min_price"),
        avg("volume").as("avg_volume"),
        avg("volatility").as("avg_volatility"),
        avg("market_sentiment").as("avg_sentiment"))

  /** S5 with layout: partitioned silver/gold writer. Partition columns
    * drive pruning for the reference's own date-ranged queries. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def readSilver(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
