package graft.tools

import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Round-6 probe (not library surface): J1 stream-stream bucket-join
  * STATE under a skewed replay — SURVEY §7.4 risk 1, parity-tested
  * since round 2 but never directly measured. One minute-bucket
  * receives a 10x event spike; the probe drives >=20 one-minute
  * triggers through [[StreamOps.bucketJoin]] (watermark 10 min) and
  * records the join state-store metrics (rows / bytes / removals)
  * from each trigger's StreamingQueryProgress.
  *
  * What bounded state looks like: state rows climb while the
  * watermark horizon fills (~11 buckets on both sides), the hot
  * bucket enters as a visible spike, and — the part that matters —
  * is REMOVED again once the watermark passes its bucket end, after
  * which steady-state rows plateau at horizon x per-trigger volume.
  * The probe asserts the plateau (final state < peak, removals > 0)
  * instead of eyeballing it. */
object R6StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = 1736081400000L // fixed epoch, minute-aligned
    val perTrigger = 50       // rows per side per ordinary bucket
    val hotTrigger = 5        // this bucket gets 10x on both sides
    val hotFactor = 10
    val nTriggers = 24

    val left = MemoryStream[(java.sql.Timestamp, Double)]
    val right = MemoryStream[(java.sql.Timestamp, Double)]
    val joined = StreamOps.bucketJoin(
      left.toDF().toDF("event_time", "price"), "price",
      right.toDF().toDF("event_time", "volume"), "volume")
    val q = joined.writeStream.format("memory").queryName("r6_state_probe")
      .outputMode("append").start()

    def rows(t: Int, n: Int): Seq[(java.sql.Timestamp, Double)] =
      (0 until n).map { i =>
        // spread inside the minute so the bucket assignment is honest
        (new java.sql.Timestamp(base + t * 60000L + (i % 60) * 997L),
          t * 1000.0 + i)
      }

    println("trigger | rows/side | state_rows | state_MB | removed | joined_total")
    val stateRows = Array.ofDim[Long](nTriggers)
    var removedTotal = 0L
    try {
      for (t <- 0 until nTriggers) {
        val n = if (t == hotTrigger) perTrigger * hotFactor else perTrigger
        left.addData(rows(t, n))
        right.addData(rows(t, n))
        q.processAllAvailable()
        val p = q.lastProgress
        val so = p.stateOperators.apply(0)
        stateRows(t) = so.numRowsTotal
        removedTotal += so.numRowsRemoved
        val joinedTotal = spark.table("r6_state_probe").count()
        println(f"$t%7d | $n%9d | ${so.numRowsTotal}%10d | " +
          f"${so.memoryUsedBytes / 1024.0 / 1024.0}%8.2f | " +
          f"${so.numRowsRemoved}%7d | $joinedTotal%12d")
      }
    } finally q.stop()

    val peak = stateRows.max
    val fin = stateRows.last
    // horizon = watermark(10) + ~1 closing bucket + 1 open bucket, both
    // sides; the hot spike must NOT survive in the final plateau
    val plateauBound = 2L * perTrigger * 13
    println(s"peak_state_rows=$peak final_state_rows=$fin " +
      s"removed_total=$removedTotal plateau_bound=$plateauBound")
    require(removedTotal > 0, "watermark never evicted any state")
    require(fin < peak, "state never shrank after the hot bucket spike")
    require(fin <= plateauBound,
      s"final state $fin exceeds the watermark-horizon bound $plateauBound")
    println("R6StreamStateProbe: PASS (state bounded, spike evicted)")
    spark.stop()
  }
}
