package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming source wiring (SURVEY.md §2.1 S1, §2.9 T8).
  *
  * Kafka options mirror the reference's subscription
  * (`Deliverable_3/NEW_train_offset_3_10min.py:94-101`): earliest
  * offsets, tolerate data loss. Rate limiting uses
  * `maxOffsetsPerTrigger` — the reference set DStream-era backpressure
  * confs (`joined_streams.py:16-18`) that are no-ops under Structured
  * Streaming; this reproduces the *intent* (bounded per-batch intake,
  * which also bounds stream-stream join state growth per trigger).
  *
  * Not exercised in tests (no broker in the test environment — the
  * MemoryStream/CSV replay paths in Ticks cover the downstream plan);
  * kept thin so the untested surface is exactly these option calls.
  */
object Sources {

  def kafkaTicks(spark: SparkSession, brokers: String, topic: String,
      maxOffsetsPerTrigger: Option[Long] = Some(700L)): DataFrame = {
    val reader = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("failOnDataLoss", "false")
    val limited = maxOffsetsPerTrigger
      .fold(reader)(n => reader.option("maxOffsetsPerTrigger", n.toString))
    Ticks.parseTicks(limited.load())
  }

  /** File-drop streaming source over the bronze JSON landing dir (the
    * engine's stand-in for the reference's WebHDFS JSON dumps, S10). */
  def jsonDirTicks(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(Ticks.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)
}
