package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val df = SparkEntry.queries("q_archive_e2e")(spark, sf)
    val good = df.filter(col("kind") === "page" &&
      col("main_text").endsWith("paragraph Żółć")).count()
    val pages = df.filter(col("kind") === "page").count()
    println(s"pages=$pages goodZolc=$good")
    df.filter(col("kind") === "page").limit(1)
      .select(col("main_text")).collect()
      .foreach(r => println("codepoints=" + r.getString(0).takeRight(6)
        .map(_.toInt.toHexString).mkString(",")))
    spark.stop()
  }
}
