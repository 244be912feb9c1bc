package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The market-tick data model (SURVEY.md §1.1): one flat 13-field record
  * per tick, identical in every consumer.
  * Reference schema: `Deliverable_3/stream_from_kafka_to_cassandra.py:19-32`.
  * Fields a feed lacks carry sentinel -1.0
  * (`Deliverable_2/Stream Data Codes/yfinance_stream.py:148-162`,
  * `xtb_stream.py:74-88`).
  */
final case class MarketTick(
    symbol: String,
    timestamp: Long, // epoch millis
    source: String,
    data_type: String,
    bid: Double,
    ask: Double,
    price: Double,
    volume: Double,
    spread_raw: Double,
    spread_table: Double,
    volatility: Double,
    market_sentiment: Double,
    trading_activity: Double)

object Ticks {

  /** Tuple shape of a tick in schema column order (handy for building
    * MemoryStream test feeds without an Encoder for the case class). */
  type MarketTickTuple = (String, Long, String, String, Double, Double,
    Double, Double, Double, Double, Double, Double, Double)

  /** Explicit declared schema — never inferred (SURVEY §1.3). */
  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("timestamp", LongType),
    StructField("source", StringType),
    StructField("data_type", StringType),
    StructField("bid", DoubleType),
    StructField("ask", DoubleType),
    StructField("price", DoubleType),
    StructField("volume", DoubleType),
    StructField("spread_raw", DoubleType),
    StructField("spread_table", DoubleType),
    StructField("volatility", DoubleType),
    StructField("market_sentiment", DoubleType),
    StructField("trading_activity", DoubleType)))

  val featureColumns: Seq[String] =
    Seq("volume", "volatility", "market_sentiment", "trading_activity")

  /** Message validation — the engine form of the reference's publish-side
    * schema checks (`Deliverable_2/Stream Data Codes/
    * tests_pub_sub_schema.py:53-98`: required symbol/timestamp,
    * future-timestamp rejection, source/data_type enums,
    * market_sentiment in [-1,1], trading_activity in [0,100]). Adds a
    * `violations` array column (empty = valid) — map-only, works the
    * same on batch and streaming frames, so ingest can route invalid
    * rows to a dead-letter sink instead of throwing per message.
    *
    * `nowMs` is caller-supplied (determinism: a query must not read the
    * clock at plan time — pass the batch/trigger timestamp). Type
    * violations surface as nulls after the declared-schema parse
    * ([[parseTicks]] casts via the schema, mirroring the reference's
    * isinstance checks), so null required fields are flagged here. */
  def validate(df: DataFrame, nowMs: Long): DataFrame = {
    val checks: Seq[(Column, String)] = Seq(
      (col("symbol").isNull, "missing_symbol"),
      (col("timestamp").isNull, "missing_timestamp"),
      (col("timestamp").isNotNull && col("timestamp") > lit(nowMs),
        "future_timestamp"),
      (!coalesce(col("source").isin("YLIFE_FEED", "XTB_FEED"), lit(false)),
        "invalid_source"),
      (!coalesce(col("data_type") === "MARKET_DATA", lit(false)),
        "invalid_data_type"),
      (col("market_sentiment").isNotNull &&
        (col("market_sentiment") < -1.0 || col("market_sentiment") > 1.0),
        "sentiment_out_of_range"),
      (col("trading_activity").isNotNull &&
        (col("trading_activity") < 0.0 || col("trading_activity") > 100.0),
        "activity_out_of_range"))
    df.withColumn("violations", array_compact(array(
      checks.map { case (c, tag) => when(c, lit(tag)) }: _*)))
  }

  /** [[validate]] then split: (valid rows without the violations column,
    * rejected rows with it) — the dead-letter routing shape. */
  def partitionValid(df: DataFrame, nowMs: Long): (DataFrame, DataFrame) = {
    val v = validate(df, nowMs)
    (v.filter(size(col("violations")) === 0).drop("violations"),
      v.filter(size(col("violations")) > 0))
  }

  /** S2+P1 — decode a Kafka-shaped frame (binary/string `value` column)
    * into flat tick columns: CAST value AS STRING → from_json → flatten.
    * Reference: `NEW_train_offset_3_10min.py:103-105`. Works identically
    * on a batch DataFrame and a readStream frame (same logical plan). */
  def parseTicks(raw: DataFrame): DataFrame =
    raw.selectExpr("CAST(value AS STRING) AS json")
      .select(from_json(col("json"), schema).as("data"))
      .select("data.*")

  /** Derive event_time from the epoch-millis long.
    * Reference: `NEW_train_offset_3_10min.py:118-121` ((ts/1000) cast).
    * timestamp_millis keeps exact milli precision (no double round-trip). */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time", timestamp_millis(col("timestamp")))

  /** P7 — sentinel repair for the XTB feed: price/volume are -1, recover
    * price as the bid/ask midpoint.
    * Reference: `NEW_train_offset_3_10min_ETH.py:113-115`. */
  def repairEthSentinels(df: DataFrame): DataFrame =
    df.withColumn("price",
      when(col("price") === -1.0d, (col("bid") + col("ask")) / 2)
        .otherwise(col("price")))

  /** P3+P2 — per-symbol model input projection: filter target symbol,
    * cast features + label to double, keep event-time source column.
    * Reference: `NEW_train_offset_3_10min.py:107-121`. */
  def modelInput(symbol: String,
      features: Seq[String] = featureColumns)(df: DataFrame): DataFrame = {
    val casted = features.map(f => col(f).cast("double").as(f))
    withEventTime(
      df.filter(col("symbol") === symbol)
        .select(col("symbol") +: casted :+
          col("price").cast("double").as("label") :+
          col("timestamp").cast("long").as("timestamp"): _*))
  }

  /** Typed core (SURVEY §1.3): Dataset[MarketTick] view of a tick frame
    * — compile-time field safety for per-record logic; convert at job
    * edges, stay DataFrame inside relational pipelines. */
  def asTicks(df: DataFrame): Dataset[MarketTick] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[MarketTick]
  }

  /** S12 — replay source: the captured-stream CSV fixture read with the
    * declared schema (`Deliverable_3/kafka_messages.csv`). Used by tests
    * to prove batch/stream agreement on identical input. */
  def readCsvFixture(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)
}
