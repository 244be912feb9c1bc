package graft.tools

import graft.operators.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway 1x/10x/100x probe for the round-10 fused kCore (not
  * library surface): synthetic uniform random graphs with node and
  * edge counts both growing 10x per step, so the peel frontier (the
  * anti-join's broadcast side) grows with the data — the regime the
  * single-exchange-per-round claim must survive. Deterministic edges
  * via xxhash64 on a range, so reruns probe the same graph. */
object R10KcoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def graph(nodes: Long, edges: Long, path: String): DataFrame = {
      if (!new java.io.File(path).exists()) {
        spark.range(edges)
          .select(pmod(xxhash64(col("id")), lit(nodes)).as("id_a"),
            pmod(xxhash64(col("id") * 2 + 1), lit(nodes)).as("id_b"))
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
      println(f"$label%-28s $med%8.3f s   rows=${runs.head._2}")
    }

    // mean degree 10 -> k=8 peels a real frontier every round
    val g1 = graph(100000L, 500000L, "/tmp/kcore1x")
    val g10 = graph(1000000L, 5000000L, "/tmp/kcore10x")
    val g100 = graph(10000000L, 50000000L, "/tmp/kcore100x")
    for ((g, tag) <- Seq((g1, "1x"), (g10, "10x"), (g100, "100x"))) {
      time(s"kCore(k=8, rounds=6) $tag") { Graph.kCore(g, 8, 6) }
    }
    spark.stop()
  }
}
