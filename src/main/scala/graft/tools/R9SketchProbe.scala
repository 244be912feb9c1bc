package graft.tools

import graft.operators.Aggregates
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway 1x/10x/100x probe for the KMV/theta set-operation sketch
  * (not library surface): synthetic key sets at 2e5 / 2e6 / 2e7
  * distinct keys with 50% overlap, timing the SKETCH path against the
  * EXACT twin (distinct + inner-join count) at each scale. The claim
  * under test is the scaladoc's: sketch cost is two TakeOrdered(k)
  * scans (flat-ish, scan-bound), exact cost is distinct-shuffle-bound
  * (grows with keys) — at 100 TB only the sketch is runnable, and the
  * gate query's error bounds transfer because the estimator's RSE
  * depends on k alone, not on the set size. Also prints the measured
  * rel errors at each scale so the transfer is evidenced, not assumed. */
object R9SketchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def sets(n: Long): (DataFrame, DataFrame) = {
      // A = keys [0, n), B = keys [n/2, 3n/2) -> |A∩B| = n/2, |A∪B| = 3n/2
      val a = spark.range(0, n).select(concat(lit("key"), col("id")).as("k"))
      val b = spark.range(n / 2, n + n / 2)
        .select(concat(lit("key"), col("id")).as("k"))
      (a, b)
    }

    def timeMed(f: => Array[org.apache.spark.sql.Row]): (Double, Array[org.apache.spark.sql.Row]) = {
      var out: Array[org.apache.spark.sql.Row] = null
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        out = f
        (System.nanoTime() - t0) / 1e9
      }
      (ts.sorted.apply(1), out)
    }

    for (n <- Seq(200000L, 2000000L, 20000000L)) {
      val (a, b) = sets(n)
      val (tS, rows) = timeMed(
        Aggregates.thetaSketchCompare(a, b, "k", 4096).collect())
      val r = rows.head
      val estI = r.getAs[Double]("est_intersection")
      val estU = r.getAs[Double]("est_union")
      val relI = math.abs(estI - n / 2.0) / (n / 2.0)
      val relU = math.abs(estU - 1.5 * n) / (1.5 * n)
      val (tE, exact) = timeMed {
        val da = a.distinct(); val db = b.distinct()
        da.agg(count(lit(1))).crossJoin(
          da.join(db, Seq("k")).agg(count(lit(1)))).collect()
      }
      println(f"n=$n%-9d sketch=$tS%6.2fs exact=$tE%6.2fs " +
        f"rel_inter=$relI%.4f rel_union=$relU%.4f " +
        s"exact_check=${exact.head.getLong(1)}")
    }
    spark.stop()
  }
}
