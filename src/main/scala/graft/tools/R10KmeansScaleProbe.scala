package graft.tools

import graft.llm.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway 1x/10x/100x probe for the round-10 exact k-means (not
  * library surface): synthetic 64-dim corpora with deterministic
  * hash-derived coordinates, rows growing 10x per step. Assignment is
  * map-only (driver-held centroid literals), so wall should be linear
  * in the scan + the (cid, dim) scalar update exchange. */
object R10KmeansScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def corpus(n: Long, path: String): DataFrame = {
      if (!new java.io.File(path).exists()) {
        spark.range(n)
          .select(col("id").as("vec_id"),
            transform(sequence(lit(0), lit(63)), i =>
              (pmod(xxhash64(col("id") * 64 + i), lit(2000L))
                .cast("double") - 1000.0) / 250.0).as("embedding"))
          .write.mode("overwrite").parquet(path)
      }
      spark.read.parquet(path)
    }

    def time(label: String)(f: => DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"$label%-26s $med%8.3f s   rows=${runs.head._2}")
    }

    val c1 = corpus(20000L, "/tmp/km1x")
    val c10 = corpus(200000L, "/tmp/km10x")
    val c100 = corpus(2000000L, "/tmp/km100x")
    for ((c, tag) <- Seq((c1, "1x"), (c10, "10x"), (c100, "100x"))) {
      time(s"kmeansFit(k=8, r=2) $tag") {
        Similarity.kmeansFit(c, "vec_id", "embedding", k = 8, rounds = 2)
      }
    }
    spark.stop()
  }
}
