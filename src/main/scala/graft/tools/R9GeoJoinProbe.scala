package graft.tools

import graft.operators.{Geo, Joins}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway 1x/10x/100x probe for the round-9 grid/interval join
  * family (not library surface): synthetic points/intervals/lots at
  * 150k / 1.5M / 15M rows, timing radiusJoin, intervalOverlapJoin,
  * gridDbscan and fifoMatch. The claim under test is the scaladocs':
  * each op reduces the scan to bounded frames (cells, cumulative
  * windows) before anything pairwise, so wall grows ~linearly with
  * the scan while candidate fan-outs stay density-bounded. All data
  * md5-deterministic — reruns reproduce. */
object R9GeoJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def u(salt: String) = (conv(substring(md5(concat(col("id")
      .cast("string"), lit(":" + salt))), 1, 13), 16, 10)
      .cast("double") + 1.0) / 4503599627370498.0

    def pts(n: Long, scaleBand: Double): DataFrame =
      spark.range(n).select(col("id"),
        ((u("lat") * 120.0 - 60.0) * scaleBand).as("lat"),
        ((u("lon") * 360.0 - 180.0) * scaleBand).as("lon"))

    def timeMed(f: => Long): (Double, Long) = {
      var out = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        out = f
        (System.nanoTime() - t0) / 1e9
      }
      (ts.sorted.apply(1), out)
    }

    println("| op | rows | wall (med of 3) | output rows |")
    println("|---|---|---|---|")
    for (n <- Seq(150000L, 1500000L, 15000000L)) {
      // radius join: the 100 TB shape is a GROWING point side against
      // a FIXED facility side (growing both on a fixed sphere inflates
      // the OUTPUT quadratically — that's data density, not the plan)
      val a = pts(n, 1.0)
      val b = pts(10000L, 1.0).select(col("id").as("fid"),
        col("lat").as("blat"), col("lon").as("blon"))
      val (tR, nR) = timeMed(Geo.radiusJoin(a, b, "lat", "lon",
        "blat", "blon", 200.0).count())
      println(s"| radiusJoin | $n x 10k | $tR s | $nR |")

      // grid DBSCAN on a concentrated band
      val (tD, nD) = timeMed(Geo.gridDbscan(pts(n, 0.3), "lat", "lon",
        "id", 2.0, 3L).filter(col("cluster").isNotNull).count())
      println(s"| gridDbscan | $n | $tD s | $nD labeled |")

      // interval overlap: the day-span grows with n so per-day density
      // (and thus output PER ROW) stays constant — the realistic
      // history-grows-with-data shape
      val span = 2300.0 * (n / 150000L)
      val iv = spark.range(n).select(col("id"),
        (u("s") * span).cast("long").as("s"))
        .withColumn("e", col("s") + 7L)
      val iw = spark.range(n / 15).select(col("id").as("wid"),
        (u("ws") * span).cast("long").as("ws"),
        ((u("wl") * 29.0).cast("long") + 1L).as("wl"))
        .withColumn("we", col("ws") + col("wl")).drop("wl")
      val (tI, nI) = timeMed(Joins.intervalOverlapJoin(iv, iw,
        "s", "e", "ws", "we", 32L).count())
      println(s"| intervalOverlapJoin | $n x ${n / 15} | $tI s | $nI |")

      // FIFO: n rows over n/300 keys (catalog shape); key from id/2 so
      // the even/odd supply-demand split covers every key
      val keys = math.max(1L, n / 300L)
      val li = spark.range(n).select(col("id"),
        pmod(floor(col("id") / 2.0).cast("long"), lit(keys)).as("k"),
        (u("q") * 20.0 + 1.0).as("q"))
      val sup = li.filter(pmod(col("id"), lit(2L)) === 0L)
        .select(col("k"), col("id").as("sid"), col("q").as("sq"))
      val dem = li.filter(pmod(col("id"), lit(2L)) === 1L)
        .select(col("k"), col("id").as("did"), col("q").as("dq"))
      val (tF, nF) = timeMed(Joins.fifoMatch(sup, dem, "k", "sid",
        "did", "sq", "dq", Nil, Nil).count())
      println(s"| fifoMatch | $n over $keys keys | $tF s | $nF |")
    }
    spark.stop()
  }
}
