package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (see /root/repo/TESTDATA.md).
  *
  * All engine operators take `DataFrame => DataFrame`; this is the single
  * scan entry point (SURVEY.md §2.1 S3 — parquet batch scan, cf. reference
  * `Deliverable_3/load_to_silver_layer.py:40-41`). We keep the vectorized
  * parquet reader ON (the reference disabled it to survive dirty bronze
  * schemas — `load_to_silver_layer.py:25`; we fix schemas instead).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark's reader rejects;
    // read it as a long (legacy conf) and floor to microseconds. The
    // sub-microsecond part is dropped — acceptable: no two test events
    // share a microsecond, and all derived keys are >= second grain.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      // convert only when ts actually came back as a nanos long — a
      // re-materialized events table already carries a real timestamp
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
