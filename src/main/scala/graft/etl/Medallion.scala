package graft.etl

import graft.operators.Relational
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Bronze normalization of scraped article dates, per source site —
    * the engine-side equivalent of the reference's Python string surgery
    * (`Deliverable_2/Batch Data Codes/scraper.py:355-395`): newline
    * collapse, 'Dodano:' prefix strip, per-site formats, and the
    * beurs.nl Dutch-month mapping — all as codegen'd column functions
    * (regexp_replace chain + multi-pattern to_timestamp coalesce), no
    * UDF. Output: TimestampType (minute precision, like the reference).
    */
  def normalizeArticleDate(date: Column, sourceSite: Column): Column = {
    val dutchMonths = Seq(
      "januari" -> "01", "februari" -> "02", "maart" -> "03",
      "april" -> "04", "mei" -> "05", "juni" -> "06", "juli" -> "07",
      "augustus" -> "08", "september" -> "09", "oktober" -> "10",
      "november" -> "11", "december" -> "12")
    val cleaned = trim(regexp_replace(
      regexp_replace(date, "\\s+", " "), "^.*Dodano:\\s*", ""))
    // beurs.nl: drop leading day name, map Dutch month word -> number
    val dutchNumeric = dutchMonths.foldLeft(
      regexp_replace(cleaned, "^\\p{L}+\\s+", "")) {
      case (acc, (m, n)) => regexp_replace(acc, m, n)
    }
    // try_to_timestamp: ANSI mode (Spark 4 default) makes to_timestamp
    // THROW on unparseable text, which would poison the coalesce chain
    def tryTs(c: Column, fmt: String) = try_to_timestamp(c, lit(fmt))
    when(sourceSite === "wnp.pl", tryTs(cleaned, "dd-MM-yyyy HH:mm"))
      .when(sourceSite === "wysokienapiecie.pl",
        date_trunc("minute", tryTs(cleaned, "yyyy-MM-dd HH:mm:ss")))
      .when(sourceSite === "beurs.nl", tryTs(dutchNumeric, "d MM yyyy HH:mm"))
      .otherwise(coalesce(
        tryTs(cleaned, "yyyy-MM-dd HH:mm:ss"),
        tryTs(cleaned, "dd-MM-yyyy HH:mm"),
        tryTs(cleaned, "yyyy-MM-dd")))
  }

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
