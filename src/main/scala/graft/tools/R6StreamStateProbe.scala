package graft.tools

import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Round-6 probe, extended round-7 (not library surface): J1
  * stream-stream bucket-join STATE under a skewed replay — SURVEY §7.4
  * risk 1, parity-tested since round 2 but never directly measured.
  * One minute-bucket receives a 10x event spike; the probe drives >=20
  * one-minute triggers through [[StreamOps.bucketJoin]] (watermark
  * 10 min) and records the join state-store metrics (rows / bytes /
  * removals) from each trigger's StreamingQueryProgress.
  *
  * What bounded state looks like: state rows climb while the
  * watermark horizon fills (~11 buckets on both sides), the hot
  * bucket enters as a visible spike, and — the part that matters —
  * is REMOVED again once the watermark passes its bucket end, after
  * which steady-state rows plateau at horizon x per-trigger volume.
  * The probe asserts the plateau (final state < peak, removals > 0)
  * instead of eyeballing it.
  *
  * Round-7 phase: the same replay through [[StreamOps.bucketJoinSalted]]
  * (salt=8). The unsalted join hash-partitions state on the bucket
  * struct, so the hot minute's state lands in ONE task's store; the
  * salted key (bucket, cell) spreads it. Measured directly from the
  * checkpoint's per-partition state files (cumulative bytes per
  * shuffle partition right after the hot trigger): the probe asserts
  * the salted run's max-partition share of state bytes is materially
  * below the unsalted run's, and that both runs join the same number
  * of output rows. */
object R6StreamStateProbe {

  val base = 1736081400000L // fixed epoch, minute-aligned
  val perTrigger = 50       // rows per side per ordinary bucket
  val hotTrigger = 5        // this bucket gets 10x on both sides
  val hotFactor = 10
  val nTriggers = 24
  val nPartitions = 8

  private def rows(t: Int, n: Int): Seq[(java.sql.Timestamp, Double)] =
    (0 until n).map { i =>
      // spread inside the minute so the bucket assignment is honest
      (new java.sql.Timestamp(base + t * 60000L + (i % 60) * 997L),
        t * 1000.0 + i)
    }

  /** Cumulative state-file bytes per shuffle partition (all join state
    * stores, all versions so far) under `ckpt`/state/0/<pid>/... */
  private def statePartitionBytes(ckpt: String): Array[Long] = {
    val out = Array.ofDim[Long](nPartitions)
    (0 until nPartitions).foreach { pid =>
      val dir = new java.io.File(s"$ckpt/state/0/$pid")
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      out(pid) = if (dir.exists()) walk(dir) else 0L
    }
    out
  }

  final case class RunResult(stateRows: Array[Long], removedTotal: Long,
    joinedTotal: Long, hotPartBytes: Array[Long])

  private def runReplay(spark: SparkSession, label: String,
      mkJoin: (DataFrame, DataFrame) => DataFrame): RunResult = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"r6probe_$label").toString
    val left = MemoryStream[(java.sql.Timestamp, Double)]
    val right = MemoryStream[(java.sql.Timestamp, Double)]
    val joined = mkJoin(
      left.toDF().toDF("event_time", "price"),
      right.toDF().toDF("event_time", "volume"))
    val q = joined.writeStream.format("memory")
      .queryName(s"r6_state_probe_$label")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    println(s"--- $label ---")
    println("trigger | rows/side | state_rows | state_MB | removed | joined_total")
    val stateRows = Array.ofDim[Long](nTriggers)
    var removedTotal = 0L
    var hotPartBytes = Array.ofDim[Long](nPartitions)
    try {
      for (t <- 0 until nTriggers) {
        // the spike is LEFT-only: the salted operator's intended regime
        // (high-volume tick stream vs modest reference feed — right-side
        // replication is the price, so right volume must be the small one)
        val n = if (t == hotTrigger) perTrigger * hotFactor else perTrigger
        left.addData(rows(t, n))
        right.addData(rows(t, perTrigger))
        q.processAllAvailable()
        val p = q.lastProgress
        val so = p.stateOperators.apply(0)
        stateRows(t) = so.numRowsTotal
        removedTotal += so.numRowsRemoved
        if (t == hotTrigger) hotPartBytes = statePartitionBytes(ckpt)
        val joinedTotal = spark.table(s"r6_state_probe_$label").count()
        println(f"$t%7d | $n%9d | ${so.numRowsTotal}%10d | " +
          f"${so.memoryUsedBytes / 1024.0 / 1024.0}%8.2f | " +
          f"${so.numRowsRemoved}%7d | $joinedTotal%12d")
      }
      RunResult(stateRows, removedTotal,
        spark.table(s"r6_state_probe_$label").count(), hotPartBytes)
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", nPartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- phase 1 (r6): unsalted join, state boundedness ---
    val plain = runReplay(spark, "plain",
      (l, r) => StreamOps.bucketJoin(l, "price", r, "volume"))
    val peak = plain.stateRows.max
    val fin = plain.stateRows.last
    // horizon = watermark(10) + ~1 closing bucket + 1 open bucket, both
    // sides; the hot spike must NOT survive in the final plateau
    val plateauBound = 2L * perTrigger * 13
    println(s"peak_state_rows=$peak final_state_rows=$fin " +
      s"removed_total=${plain.removedTotal} plateau_bound=$plateauBound")
    require(plain.removedTotal > 0, "watermark never evicted any state")
    require(fin < peak, "state never shrank after the hot bucket spike")
    require(fin <= plateauBound,
      s"final state $fin exceeds the watermark-horizon bound $plateauBound")
    println("R6StreamStateProbe phase 1: PASS (state bounded, spike evicted)")

    // --- phase 2 (r7): salted join spreads the hot bucket's state ---
    val salted = runReplay(spark, "salted",
      (l, r) => StreamOps.bucketJoinSalted(l, "price", r, "volume", salt = 8))
    def share(b: Array[Long]): Double = {
      val tot = math.max(1L, b.sum)
      b.max.toDouble / tot
    }
    val plainShare = share(plain.hotPartBytes)
    val saltedShare = share(salted.hotPartBytes)
    println(s"hot-trigger state bytes/partition plain =" +
      plain.hotPartBytes.mkString("[", ",", "]"))
    println(s"hot-trigger state bytes/partition salted=" +
      salted.hotPartBytes.mkString("[", ",", "]"))
    println(f"max-partition share: plain=$plainShare%.3f salted=$saltedShare%.3f")
    require(salted.joinedTotal == plain.joinedTotal,
      s"salted join output ${salted.joinedTotal} != plain ${plain.joinedTotal}")
    require(saltedShare < plainShare,
      "salting failed to spread the hot bucket's state")
    println("R6StreamStateProbe phase 2: PASS (salted output equal, " +
      "hot-bucket state spread across cells)")
    spark.stop()
  }
}
