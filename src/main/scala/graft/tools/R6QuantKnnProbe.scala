package graft.tools

import graft.llm.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 probe (not library surface): float vs int8-quantized
  * brute-force kNN at 1x and 10x the sf0.1 embeddings corpus.
  *
  * What the int8 path buys at scale is BANDWIDTH, not FLOPs: the
  * corpus scan and the broadcast query batch move 4 bytes -> 1 byte
  * per dimension, and the pair kernel accumulates in integers. On a
  * single box with a hot page cache the wall-clock gap understates
  * the cluster gain (where the corpus scan is remote-read-bound), so
  * the probe records BOTH wall time and the scan width Spark reports
  * for the quantized vs float corpus projections.
  *
  * Run: sbt "runMain graft.tools.R6QuantKnnProbe" (sf dir via arg 0,
  * default /root/testdata/sf0.1). Results land in SCALING.md.
  */
object R6QuantKnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)

    def replicate(times: Int) =
      if (times == 1) emb
      else emb.crossJoin(
          spark.range(times).select(col("id").as("__rep")))
        .select((col("vec_id") * times + col("__rep")).as("vec_id"),
          col("embedding"))

    def time(label: String)(f: => Long): Unit = {
      // median of 3 (first run pays codegen JIT)
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"$label%-28s ${med}%8.2f s   rows=${runs.head._2}")
    }

    for (times <- Seq(1, 10)) {
      val corpus = replicate(times).localCheckpoint()
      println(s"== corpus x$times (${corpus.count()} vectors) ==")
      time(s"float bruteForceKnn x$times") {
        Similarity.bruteForceKnn(queries, corpus, "vec_id", "embedding", 5)
          .count()
      }
      time(s"int8 quantizedKnn x$times") {
        Similarity.quantizedKnn(queries, corpus, "vec_id", "embedding", 5)
          .count()
      }
      // PQ rung: index built once (the serving contract), searches timed
      val pq = Similarity.buildPq(corpus, "vec_id", "embedding",
        m = 16, ksub = 256)
      pq.encoded.count() // materialize the encode outside the timer
      time(s"pq ADC pqKnn x$times") {
        Similarity.pqKnn(queries, pq, "vec_id", "embedding", 5).count()
      }
      // the bandwidth story: bytes per vector in each representation
      val widths = corpus.limit(1000)
        .select(
          avg(size(col("embedding")) * 4).as("float_bytes"),
          avg(length(graft.plans.VectorExpressions
            .quantizeInt8(col("embedding")))).as("int8_bytes"),
          avg(length(graft.plans.VectorExpressions
            .pqEncode(col("embedding"), pq.codebooks, pq.coarse)))
            .as("pq_bytes"))
        .collect()(0)
      println(s"   scan width/vec: float=${widths.getDouble(0)} B, " +
        s"int8=${widths.getDouble(1)} B, pq=${widths.getDouble(2)} B")
      pq.encoded.unpersist(blocking = true)
      corpus.unpersist(blocking = true)
    }
    spark.stop()
  }
}
