package graft

import graft.streaming.{ParquetKeyedStore, StreamOps, Ticks}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tick(sym: String, tsMs: Long, price: Double,
      vol: Double = 100.0): Ticks.MarketTickTuple =
    (sym, tsMs, "YLIFE_FEED", "MARKET_DATA", -1.0, -1.0, price, vol,
      -1.0, -1.0, 0.4, 0.1, 50.0)

  private val base = 1736081400000L // aligned ms epoch

  private def ticksDf(rows: Seq[Ticks.MarketTickTuple]) =
    rows.toDF("symbol", "timestamp", "source", "data_type", "bid", "ask",
      "price", "volume", "spread_raw", "spread_table", "volatility",
      "market_sentiment", "trading_activity")

  test("parseTicks decodes kafka-shaped json values") {
    val json = """{"symbol":"XOM","timestamp":1736081410598,"source":"YLIFE_FEED","data_type":"MARKET_DATA","bid":-1.0,"ask":-1.0,"price":64.3,"volume":5021535.0,"spread_raw":-1.0,"spread_table":-1.0,"volatility":0.402,"market_sentiment":-0.313,"trading_activity":60.21}"""
    val raw = Seq(json).toDF("value")
    val out = Ticks.parseTicks(raw).collect().head
    assert(out.getAs[String]("symbol") == "XOM")
    assert(out.getAs[Double]("price") == 64.3)
    assert(out.getAs[Long]("timestamp") == 1736081410598L)
  }

  test("validate mirrors the reference's nine pub-sub schema rules") {
    val now = base + 1000000L
    def row(sym: String = "XOM", ts: java.lang.Long = base,
        src: String = "YLIFE_FEED", dt: String = "MARKET_DATA",
        sent: java.lang.Double = 0.2, act: java.lang.Double = 75.0) =
      (sym, ts, src, dt, sent, act)
    val df = Seq(
      row(),                                  // valid
      row(sym = null),                        // missing symbol
      row(ts = null),                         // missing timestamp (wrong type -> null post-parse)
      row(ts = now + 1L),                     // future timestamp
      row(src = "BLOOMBERG"),                 // invalid source enum
      row(src = null),                        // missing source counts as invalid
      row(dt = "NEWS"),                       // invalid data_type enum
      row(sent = -1.5),                       // sentiment below range
      row(act = 150.0))                       // activity above range
      .toDF("symbol", "timestamp", "source", "data_type",
        "market_sentiment", "trading_activity")
    val out = Ticks.validate(df, now)
      .select("violations").as[Seq[String]].collect()
    assert(out(0).isEmpty)
    assert(out(1) == Seq("missing_symbol"))
    assert(out(2) == Seq("missing_timestamp"))
    assert(out(3) == Seq("future_timestamp"))
    assert(out(4) == Seq("invalid_source"))
    assert(out(5) == Seq("invalid_source"))
    assert(out(6) == Seq("invalid_data_type"))
    assert(out(7) == Seq("sentiment_out_of_range"))
    assert(out(8) == Seq("activity_out_of_range"))
    val (ok, dead) = Ticks.partitionValid(df, now)
    assert(ok.count() == 1 && dead.count() == 8)
    assert(!ok.columns.contains("violations"))
    // map-only: routing must not shuffle
    val plan = Ticks.validate(df, now).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("repairEthSentinels recovers price from bid/ask midpoint") {
    val df = ticksDf(Seq(tick("ETHEREUM", base, -1.0)))
      .withColumn("bid", lit(100.0)).withColumn("ask", lit(104.0))
    val out = Ticks.repairEthSentinels(df).select("price").as[Double]
      .collect().head
    assert(out == 102.0)
  }

  test("windowedFeatureAvg batch == streaming (MemoryStream parity)") {
    val rows = (0 until 60).map { i =>
      tick("XOM", base + i * 30000L, 100.0 + i, vol = 1000.0 + i)
    }
    val batchIn = Ticks.modelInput("XOM")(ticksDf(rows))
    val expected = StreamOps.windowedFeatureAvg(streaming = false)(batchIn)
      .orderBy("window_start")
      .collect().map(_.toSeq).toSeq

    // avg() partial-state merge order differs between the batch and
    // micro-batch runs — compare doubles with tolerance, not bit-equal.
    def approxEq(a: Seq[Seq[Any]], b: Seq[Seq[Any]]): Boolean =
      a.size == b.size && a.zip(b).forall { case (ra, rb) =>
        ra.zip(rb).forall {
          case (x: Double, y: Double) => math.abs(x - y) < 1e-9
          case (x, y) => x == y
        }
      }

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ticks.MarketTickTuple]
    mem.addData(rows)
    val streamIn = Ticks.modelInput("XOM")(
      mem.toDF().toDF("symbol", "timestamp", "source", "data_type", "bid",
        "ask", "price", "volume", "spread_raw", "spread_table", "volatility",
        "market_sentiment", "trading_activity"))
    val q = StreamOps.windowedFeatureAvg()(streamIn)
      .writeStream.format("memory").queryName("wfa_parity")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("wfa_parity").orderBy("window_start")
        .collect().map(_.toSeq).toSeq
      assert(approxEq(got, expected), s"$got vs $expected")
    } finally q.stop()
  }

  test("bucketJoin batch == streaming inner join on 1-minute buckets") {
    val left = (0 until 20).map(i => tick("BP", base + i * 15000L, 30.0 + i))
    val right = (0 until 10).map(i => tick("ETHEREUM", base + i * 30000L, 3000.0 + i))
    def prep(rows: Seq[Ticks.MarketTickTuple]) =
      Ticks.withEventTime(ticksDf(rows))

    val expected = StreamOps.bucketJoin(
      prep(left), "price", prep(right), "price", streaming = false).count()

    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[Ticks.MarketTickTuple]
    val memR = MemoryStream[Ticks.MarketTickTuple]
    memL.addData(left); memR.addData(right)
    def prepStream(m: MemoryStream[Ticks.MarketTickTuple]) =
      Ticks.withEventTime(m.toDF().toDF("symbol", "timestamp", "source",
        "data_type", "bid", "ask", "price", "volume", "spread_raw",
        "spread_table", "volatility", "market_sentiment", "trading_activity"))
    val joined = StreamOps.bucketJoin(
      prepStream(memL), "price", prepStream(memR), "price")
    val q = joined.writeStream.format("memory").queryName("bj_parity")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("bj_parity").count() == expected)
    } finally q.stop()
  }

  test("intervalJoin batch == streaming time-interval join") {
    // left every 15 s, right every 40 s, match window ±20 s on the
    // shared symbol: pairs straddle bucket edges on purpose — the
    // shape bucketJoin drops and the interval condition keeps
    val left = (0 until 20).map(i => tick("BP", base + i * 15000L, 30.0 + i))
    val right = (0 until 8).map(i => tick("BP", base + i * 40000L, 3000.0 + i))
    def prep(rows: Seq[Ticks.MarketTickTuple]) =
      Ticks.withEventTime(ticksDf(rows))
    val batch = StreamOps.intervalJoin(
      prep(left), "price", prep(right), "price", "symbol",
      before = "20 seconds", after = "20 seconds", streaming = false)
    val expected = batch.count()
    assert(expected > 0)
    // lag is bounded by the window on every row
    batch.collect().foreach(r =>
      assert(math.abs(r.getAs[Double]("lag_s")) <= 20.0))
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[Ticks.MarketTickTuple]
    val memR = MemoryStream[Ticks.MarketTickTuple]
    memL.addData(left); memR.addData(right)
    def prepStream(m: MemoryStream[Ticks.MarketTickTuple]) =
      Ticks.withEventTime(m.toDF().toDF("symbol", "timestamp", "source",
        "data_type", "bid", "ask", "price", "volume", "spread_raw",
        "spread_table", "volatility", "market_sentiment", "trading_activity"))
    val joined = StreamOps.intervalJoin(
      prepStream(memL), "price", prepStream(memR), "price", "symbol",
      before = "20 seconds", after = "20 seconds")
    val q = joined.writeStream.format("memory").queryName("ij_parity")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ij_parity").count() == expected)
    } finally q.stop()
  }

  test("bucketJoinOuter: unmatched buckets emit null-padded once the watermark passes") {
    // left ticks every minute 0-9, right only on even minutes: odd
    // buckets must surface with a null right side. Flush ticks at
    // +30/+31 min advance the watermark past every data bucket (outer
    // results are watermark-late by construction).
    val left = (0 until 10).map(i => tick("BP", base + i * 60000L, 30.0 + i))
    val right = (0 until 5).map(i => tick("ETHEREUM", base + i * 120000L, 3000.0 + i))
    def prep(rows: Seq[Ticks.MarketTickTuple]) =
      Ticks.withEventTime(ticksDf(rows))
    val horizon = new java.sql.Timestamp(base + 10 * 60000L)
    val expected = StreamOps.bucketJoinOuter(
        prep(left), "price", prep(right), "price", streaming = false)
      .filter(col("time_bucket.start") < lit(horizon))
    assert(expected.count() == 10 &&
      expected.filter(col("r_price").isNull).count() == 5)

    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[Ticks.MarketTickTuple]
    val memR = MemoryStream[Ticks.MarketTickTuple]
    def prepStream(m: MemoryStream[Ticks.MarketTickTuple]) =
      Ticks.withEventTime(m.toDF().toDF("symbol", "timestamp", "source",
        "data_type", "bid", "ask", "price", "volume", "spread_raw",
        "spread_table", "volatility", "market_sentiment", "trading_activity"))
    val joined = StreamOps.bucketJoinOuter(
      prepStream(memL), "price", prepStream(memR), "price")
    val q = joined.writeStream.format("memory").queryName("bjo_parity")
      .outputMode("append").start()
    try {
      memL.addData(left); memR.addData(right)
      q.processAllAvailable()
      // two watermark-advancing batches: wm trails one batch behind
      memL.addData(Seq(tick("BP", base + 30 * 60000L, 99.0)))
      memR.addData(Seq(tick("ETHEREUM", base + 30 * 60000L, 999.0)))
      q.processAllAvailable()
      memL.addData(Seq(tick("BP", base + 31 * 60000L, 99.5)))
      memR.addData(Seq(tick("ETHEREUM", base + 31 * 60000L, 999.5)))
      q.processAllAvailable()
      val got = spark.table("bjo_parity")
        .filter(col("time_bucket.start") < lit(horizon))
      assert(got.count() == 10, "outer rows missing after watermark advance")
      assert(got.filter(col("r_price").isNull).count() == 5)
    } finally q.stop()
  }

  test("bucketJoinSalted == bucketJoin row-for-row, batch and stream") {
    // skewed: one hot minute carries most left rows, exercising the
    // replicate-right/spread-left construction
    val left = (0 until 30).map(i => tick("BP", base + (i % 3) * 1000L, 30.0 + i)) ++
      (0 until 6).map(i => tick("BP", base + 120000L + i * 5000L, 90.0 + i))
    val right = (0 until 8).map(i => tick("ETHEREUM", base + i * 30000L, 3000.0 + i))
    def prep(rows: Seq[Ticks.MarketTickTuple]) =
      Ticks.withEventTime(ticksDf(rows))
    def sorted(df: org.apache.spark.sql.DataFrame) = df
      .select(col("time_bucket.start").cast("long").as("b"),
        col("l_price"), col("r_price"))
      .orderBy("b", "l_price", "r_price").collect().map(_.toSeq).toSeq

    val plain = StreamOps.bucketJoin(
      prep(left), "price", prep(right), "price", streaming = false)
    val salted = StreamOps.bucketJoinSalted(
      prep(left), "price", prep(right), "price", salt = 4, streaming = false)
    assert(sorted(salted) == sorted(plain) && sorted(plain).nonEmpty)

    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[Ticks.MarketTickTuple]
    val memR = MemoryStream[Ticks.MarketTickTuple]
    memL.addData(left); memR.addData(right)
    def prepStream(m: MemoryStream[Ticks.MarketTickTuple]) =
      Ticks.withEventTime(m.toDF().toDF("symbol", "timestamp", "source",
        "data_type", "bid", "ask", "price", "volume", "spread_raw",
        "spread_table", "volatility", "market_sentiment", "trading_activity"))
    val q = StreamOps.bucketJoinSalted(
        prepStream(memL), "price", prepStream(memR), "price", salt = 4)
      .writeStream.format("memory").queryName("bjs_parity")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(sorted(spark.table("bjs_parity")) == sorted(plain))
    } finally q.stop()
  }

  test("bucketCorrSummary computes corr of minute means in one pass") {
    // two perfectly correlated series across 5 buckets
    val left = (0 until 5).flatMap(b => Seq(
      tick("BP", base + b * 60000L, 10.0 + b),
      tick("BP", base + b * 60000L + 1000L, 12.0 + b)))
    val right = (0 until 5).map(b => tick("ETHEREUM", base + b * 60000L, 100.0 + 2 * b))
    val joined = StreamOps.bucketJoin(
      Ticks.withEventTime(ticksDf(left)), "price",
      Ticks.withEventTime(ticksDf(right)), "price", streaming = false)
    val r = StreamOps.bucketCorrSummary(joined, "price", "price").collect().head
    assert(math.abs(r.getAs[Double]("correlation") - 1.0) < 1e-12)
    assert(r.getAs[Long]("n_buckets") == 5L)
  }

  test("backfillLabels overwrites labels inside the window only") {
    val served = Seq(
      ("XOM", new java.sql.Timestamp(base + 60000L), 1.0),
      ("XOM", new java.sql.Timestamp(base + 999 * 60000L), 2.0))
      .toDF("symbol", "event_time", "label")
    val windowAvg = Seq(
      ("XOM", new java.sql.Timestamp(base), new java.sql.Timestamp(base + 600000L), 42.0))
      .toDF("symbol", "window_start", "window_end", "label")
    val out = StreamOps.backfillLabels(served, windowAvg)
      .orderBy("event_time").select("label").as[Double].collect()
    assert(out.toSeq == Seq(42.0, 2.0))
  }

  test("ParquetKeyedStore.upsert is last-writer-wins per key") {
    val dir = tmpDir("store") + "/t"
    val store = new ParquetKeyedStore(dir, Seq("symbol", "timestamp"), "version")
    store.upsert(Seq(("XOM", 1L, 10.0, 1L), ("BP", 1L, 20.0, 1L))
      .toDF("symbol", "timestamp", "price", "version"))
    store.upsert(Seq(("XOM", 1L, 99.0, 2L), ("COP", 2L, 30.0, 2L))
      .toDF("symbol", "timestamp", "price", "version"))
    val out = store.read(spark).orderBy("symbol")
      .select("symbol", "price").as[(String, Double)].collect()
    assert(out.toSeq == Seq(("BP", 20.0), ("COP", 30.0), ("XOM", 99.0)))
  }

  test("PartitionedParquetKeyedStore rewrites only touched partitions") {
    import graft.streaming.PartitionedParquetKeyedStore
    val dir = tmpDir("pstore") + "/t"
    val store = new PartitionedParquetKeyedStore(
      dir, "symbol", Seq("symbol", "ts"), "v")
    store.upsert(Seq(("XOM", 1L, 1L, 10.0), ("BP", 1L, 1L, 20.0))
      .toDF("symbol", "ts", "v", "price"))
    def bpFiles() = {
      val d = new java.io.File(s"$dir/symbol=BP")
      d.listFiles().map(f => (f.getName, f.lastModified)).sortBy(_._1).toSeq
    }
    val bpBefore = bpFiles()
    // second batch touches only XOM: upserts a new version of ts=1 and
    // a new ts=2 row
    store.upsert(Seq(("XOM", 1L, 2L, 11.0), ("XOM", 2L, 1L, 12.0))
      .toDF("symbol", "ts", "v", "price"))
    assert(bpFiles() == bpBefore, "untouched partition must not be rewritten")
    val out = store.read(spark)
      .select("symbol", "ts", "v", "price")
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      ("BP", 1L, 1L, 20.0),
      ("XOM", 1L, 2L, 11.0),   // last-writer-wins by version
      ("XOM", 2L, 1L, 12.0)))
  }

  test("PartitionedParquetKeyedStore round-trips null and special-char partition values") {
    import graft.streaming.PartitionedParquetKeyedStore
    val dir = tmpDir("pstore-esc") + "/t"
    val store = new PartitionedParquetKeyedStore(
      dir, "sym", Seq("sym", "ts"), "v")
    // "a/b=c d" needs Spark's partition-path escaping; null must land
    // in __HIVE_DEFAULT_PARTITION__ and merge (not be silently dropped)
    store.upsert(Seq(("a/b=c d", 1L, 1L, 10.0), (null, 1L, 1L, 20.0))
      .toDF("sym", "ts", "v", "price"))
    store.upsert(Seq(("a/b=c d", 1L, 2L, 11.0), (null, 1L, 2L, 21.0))
      .toDF("sym", "ts", "v", "price"))
    val out = store.read(spark)
      .select("sym", "ts", "v", "price")
      .as[(String, Long, Long, Double)].collect()
      .sortBy(r => (Option(r._1), r._2))
    assert(out.toSeq == Seq(
      (null, 1L, 2L, 21.0),        // null key upserted, last-writer-wins
      ("a/b=c d", 1L, 2L, 11.0)))  // escaped dir discovered + merged
  }

  test("JdbcKeyedStore: DB-side MERGE upsert, last-writer-wins, replay-safe") {
    // same upsert/read contract as the parquet stores, but against a
    // real external store over JDBC (in-JVM Derby): staging + MERGE,
    // O(batch) per upsert — closes the SURVEY S4/S6 external-store gap
    val url = s"jdbc:derby:${tmpDir("derby")}/db;create=true"
    val store = new graft.streaming.JdbcKeyedStore(
      url, "serving", Seq("symbol", "timestamp"), "version")
    store.upsert(Seq(("XOM", 1L, 10.0, 1L), ("BP", 1L, 20.0, 1L))
      .toDF("symbol", "timestamp", "price", "version"))
    store.upsert(Seq(("XOM", 1L, 99.0, 2L), ("COP", 2L, 30.0, 2L))
      .toDF("symbol", "timestamp", "price", "version"))
    // an at-least-once REPLAY of the stale version must lose to the
    // newer stored row (version guard), and an equal-version replay
    // must be a no-op rewrite, not a duplicate
    store.upsert(Seq(("XOM", 1L, 55.0, 1L), ("COP", 2L, 30.0, 2L))
      .toDF("symbol", "timestamp", "price", "version"))
    val out = store.read(spark).orderBy("symbol")
      .select("symbol", "price", "version")
      .as[(String, Double, Long)].collect()
    assert(out.toSeq == Seq(
      ("BP", 20.0, 1L), ("COP", 30.0, 2L), ("XOM", 99.0, 2L)))
    // within-batch dedup: two versions of one key in a single batch
    store.upsert(Seq(("NEW", 9L, 1.0, 5L), ("NEW", 9L, 2.0, 6L))
      .toDF("symbol", "timestamp", "price", "version"))
    val n = store.read(spark).filter($"symbol" === "NEW")
      .select("price").as[Double].collect()
    assert(n.toSeq == Seq(2.0))
  }

  test("KeyedStore.exists: false before first upsert, true after — all impls") {
    // callers gate first-batch handling on exists (never on swallowed
    // read errors), so the probe must be right on every store impl;
    // the JDBC probe in particular must not depend on Derby's
    // upper-case identifier folding
    val pq = new graft.streaming.ParquetKeyedStore(
      tmpDir("ex-pq") + "/store", Seq("k"), "v")
    val part = new graft.streaming.PartitionedParquetKeyedStore(
      tmpDir("ex-part") + "/store", "k", Seq("k"), "v")
    val jdbc = new graft.streaming.JdbcKeyedStore(
      s"jdbc:derby:${tmpDir("ex-derby")}/db;create=true", "ex_tbl",
      Seq("k"), "v")
    val batch = Seq(("a", 1L)).toDF("k", "v")
    for (store <- Seq[graft.streaming.KeyedStore](pq, part, jdbc)) {
      assert(!store.exists, store.getClass.getSimpleName)
      store.upsert(batch)
      assert(store.exists, store.getClass.getSimpleName)
      assert(store.read(spark).count() == 1L)
    }
  }

  test("JdbcKeyedStore serves as the live foreachBatch upsert sink") {
    // the S6 serving-store contract driven through the real streaming
    // path: MemoryStream -> upsertEachBatch -> JDBC MERGE, two
    // micro-batches with overlapping keys, last-writer-wins read-back
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val url = s"jdbc:derby:${tmpDir("derby-live")}/db;create=true"
    val store = new graft.streaming.JdbcKeyedStore(
      url, "live_serving", Seq("symbol"), "version")
    val mem = MemoryStream[(String, Double, Long)]
    val q = graft.streaming.Sinks.upsertEachBatch(
      mem.toDF().toDF("symbol", "price", "version"), store,
      tmpDir("ckpt-jdbc"), triggerMs = 10L)
    try {
      mem.addData(("XOM", 10.0, 1L), ("BP", 20.0, 1L))
      q.processAllAvailable()
      mem.addData(("XOM", 99.0, 2L), ("COP", 30.0, 1L))
      q.processAllAvailable()
    } finally q.stop()
    val out = store.read(spark).orderBy("symbol")
      .select("symbol", "price").as[(String, Double)].collect()
    assert(out.toSeq == Seq(("BP", 20.0), ("COP", 30.0), ("XOM", 99.0)))
  }

  test("consoleSink drives micro-batches through the console writer") {
    // S7 live: MemoryStream -> console sink; the query must process
    // both batches without error and report sunk rows in its progress
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    // trigger slow enough that idle-tick progress events can't flood
    // recentProgress' bounded buffer and evict the row-bearing entries
    val q = graft.streaming.Sinks.consoleSink(
      mem.toDF().toDF("symbol", "price"), triggerMs = 200L, numRows = 5)
    try {
      // progress reporting trails processAllAvailable; poll briefly
      def sunkAtLeast(n: Long): Long = {
        // idle triggers report numOutputRows = -1 (unknown), not 0
        def sunk() = q.recentProgress
          .map(p => math.max(0L, p.sink.numOutputRows)).sum
        val deadline = System.nanoTime() + 10000000000L
        while (sunk() < n && System.nanoTime() < deadline) Thread.sleep(50)
        sunk()
      }
      mem.addData(("XOM", 10.0), ("BP", 20.0))
      q.processAllAvailable()
      assert(sunkAtLeast(2) == 2, "first micro-batch")
      mem.addData(("COP", 30.0))
      q.processAllAvailable()
      assert(sunkAtLeast(3) == 3, "second micro-batch")
    } finally q.stop()
  }

  test("nearDedupIngest drops stream docs duplicating the kept corpus") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val baseA = "the quick brown fox jumps over the lazy dog while the " +
      "patient observer writes down every single movement it makes in " +
      "the quiet golden afternoon light today"
    val store = new ParquetKeyedStore(
      tmpDir("ingest") + "/corpus", Seq("doc_id"), "doc_id")
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.nearDedupIngest(
      mem.toDF().toDF("doc_id", "text"), store, "doc_id", "text",
      tmpDir("ckpt-ingest"), triggerMs = 10L)
    try {
      mem.addData((1L, baseA),
        (2L, "completely different content about spark query engines and shuffles"))
      q.processAllAvailable()
      mem.addData(
        (3L, baseA),                             // exact dup of kept 1 -> drop
        (4L, baseA.replace("today", "tonight")), // near dup of kept 1 -> drop
        (5L, "a genuinely fresh document with vocabulary nothing else shares"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = store.read(spark).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 5L))
  }

  test("nearDedupIngest reads the kept corpus ONCE across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val inner = new ParquetKeyedStore(
      tmpDir("ingest-once") + "/corpus", Seq("doc_id"), "doc_id")
    // pre-populate so there IS a corpus to read on stream start
    inner.upsert(Seq(
      (1L, "a seeded corpus document that lives in the store already"))
      .toDF("doc_id", "text"))
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val store = new graft.streaming.KeyedStore {
      override def upsert(b: org.apache.spark.sql.DataFrame): Unit =
        inner.upsert(b)
      override def read(s: org.apache.spark.sql.SparkSession) = {
        reads.incrementAndGet(); inner.read(s)
      }
      override def exists: Boolean = inner.exists
    }
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.nearDedupIngest(
      mem.toDF().toDF("doc_id", "text"), store, "doc_id", "text",
      tmpDir("ckpt-ingest-once"), triggerMs = 10L)
    try {
      mem.addData((2L, "a second document with its own distinct vocabulary"))
      q.processAllAvailable()
      mem.addData(
        (3L, "a seeded corpus document that lives in the store already"), // dup of 1
        (4L, "a second document with its own distinct vocabulary"),       // dup of 2
        (5L, "yet another novel piece of text unlike the previous ones"))
      q.processAllAvailable()
      mem.addData(
        (6L, "yet another novel piece of text unlike the previous ones")) // dup of 5
      q.processAllAvailable()
    } finally q.stop()
    val kept = inner.read(spark).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 5L))
    // batch 1 built the state from ONE store read; batches 2 and 3
    // deduped against the extended in-memory state (dups of docs
    // accepted in EARLIER batches were caught without re-reading)
    assert(reads.get() == 1,
      s"corpus re-read ${reads.get()} times; state extension broken")
  }

  test("nearDedupIngest releases corpus-state blocks when the query stops") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = new ParquetKeyedStore(
      tmpDir("ingest-release") + "/corpus", Seq("doc_id"), "doc_id")
    def residentRdds(): Int = spark.sparkContext.getPersistentRDDs.size
    val baseline = residentRdds()
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.nearDedupIngest(
      mem.toDF().toDF("doc_id", "text"), store, "doc_id", "text",
      tmpDir("ckpt-ingest-release"), triggerMs = 10L)
    try {
      mem.addData((1L, "first unique document with its own wording"))
      q.processAllAvailable()
      // a second batch forces extendCorpusDedupState, so the final
      // state frames are localCheckpoints — the case Dataset.unpersist
      // alone cannot release
      mem.addData((2L, "second document that shares no phrasing at all"))
      q.processAllAvailable()
      assert(residentRdds() > baseline,
        "live ingest state should pin corpus fingerprint/signature blocks")
    } finally q.stop()
    // onQueryTerminated fires asynchronously after stop()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (residentRdds() > baseline && System.nanoTime() < deadline)
      Thread.sleep(50)
    // <= not ==: the shared session's async ContextCleaner may release
    // leftover checkpoints from EARLIER tests during this one, dipping
    // the count below the captured baseline
    assert(residentRdds() <= baseline,
      s"corpus-state blocks leaked after stop(): ${residentRdds()} resident vs baseline $baseline")
  }

  test("JdbcKeyedStore.upsert is safe under concurrent writers") {
    // same driver-JVM serialization contract as the parquet stores:
    // two foreachBatch-style writers share one store instance and the
    // instance lock must serialize the staging+MERGE cycles
    val url = s"jdbc:derby:${tmpDir("derby-conc")}/db;create=true"
    val store = new graft.streaming.JdbcKeyedStore(
      url, "conc", Seq("k"), "v")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until 2).map { t =>
      new Thread(() => {
        try {
          (0 until 5).foreach { i =>
            store.upsert(Seq((s"k-$t-$i", 1L)).toDF("k", "v"))
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, errors)
    assert(store.read(spark).count() == 10L)
  }

  test("ParquetKeyedStore.upsert is safe under concurrent writers") {
    // StreamJobs wires two foreachBatch writers (predictor +
    // labelUpdater) to one store in the same driver JVM — the
    // instance-level lock must serialize them with no lost updates
    val dir = tmpDir("store-conc") + "/t"
    val store = new ParquetKeyedStore(dir, Seq("k"), "v")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until 2).map { t =>
      new Thread(() => {
        try {
          (0 until 5).foreach { i =>
            store.upsert(Seq((s"k-$t-$i", 1L)).toDF("k", "v"))
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, errors)
    assert(store.read(spark).count() == 10L)
  }

  test("contaminationScreen runs on a stream (stateless ingest decontamination)") {
    implicit val sqlCtx = spark.sqlContext
    val eval = Seq((100L, "held out benchmark sentence never for training"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val screened = graft.llm.Dedup.contaminationScreen(
      mem.toDF().toDF("doc_id", "text"), eval, "doc_id", "text", 3)
    assert(screened.isStreaming, "screen must stay a streaming frame")
    val q = screened.writeStream.format("memory").queryName("screen_st")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "held out benchmark sentence never for training"), // leak
        (2L, "an ordinary training document with its own words"))
      q.processAllAvailable()
      val out = spark.table("screen_st")
        .select("doc_id", "est_contamination")
        .as[(Long, Double)].collect().toMap
      assert(out(1L) == 1.0, s"leaked doc must flag: $out")
      assert(out(2L) == 0.0, s"clean doc must not flag: $out")
    } finally q.stop()
  }

  test("Gopher repetition/quality signals run map-only on a stream") {
    // the kernel expression is a stateless projection, so an ingest
    // quality screen is just withColumn on the streaming frame — this
    // pins batch==stream value parity and that no state/shuffle sneaks
    // into the plan (streaming would reject it otherwise)
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.Text
    val rows = Seq(
      (1L, "a b c d e a b c d e"),
      (2L, "the quick brown fox and the lazy dog with it"),
      (3L, ""))
    def signals(df: org.apache.spark.sql.DataFrame) = {
      val r = Text.gopherRepetition(col("text"))
      df.select(col("doc_id"),
        round(r.getItem(3), 6).as("dup5"),
        round(r.getItem(9), 6).as("alpha"),
        Text.tokenCount(col("text")).as("n_words"))
    }
    val mem = MemoryStream[(Long, String)]
    val q = signals(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gopher_st")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("gopher_st").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getInt(3)))
        .toMap
      val batch = signals(rows.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getInt(3)))
        .toMap
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(streamed(1L)._1 == 1.0) // repeated phrase flags dup5
    } finally q.stop()
  }

  test("streamingDedup drops duplicate keys across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val in = mem.toDF().toDF("doc_key", "ts_ms")
      .withColumn("event_time", (col("ts_ms") / 1000).cast("timestamp"))
    val q = StreamOps.streamingDedup(in, "event_time", "10 minutes",
      Seq("doc_key"))
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      mem.addData(("a", base), ("a", base + 1000), ("b", base))
      q.processAllAvailable()
      // a duplicate arriving in a LATER micro-batch, inside the
      // watermark horizon, is still dropped (state remembers the key)
      mem.addData(("a", base + 2000), ("c", base + 2000))
      q.processAllAvailable()
      val keys = spark.table("sdedup").select("doc_key").as[String]
        .collect().sorted.toSeq
      assert(keys == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("watermark drops late data in append mode (T1/T7 semantics)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ticks.MarketTickTuple]
    val streamIn = Ticks.modelInput("XOM")(
      mem.toDF().toDF("symbol", "timestamp", "source", "data_type", "bid",
        "ask", "price", "volume", "spread_raw", "spread_table", "volatility",
        "market_sentiment", "trading_activity"))
    val q = StreamOps.windowedFeatureAvg()(streamIn)
      .writeStream.format("memory").queryName("wm_drop")
      .outputMode("append").start()
    try {
      // window [base, base+10min) gets two on-time ticks
      mem.addData(Seq(tick("XOM", base + 60000L, 100.0),
        tick("XOM", base + 120000L, 200.0)))
      q.processAllAvailable()
      // advance watermark far past that window (event 2h later)
      mem.addData(Seq(tick("XOM", base + 7200000L, 1.0)))
      q.processAllAvailable()
      val emitted = spark.table("wm_drop")
        .filter(col("window_start") === new java.sql.Timestamp(base))
        .select("label").as[Double].collect()
      assert(emitted.toSeq == Seq(150.0)) // closed with the on-time avg
      // a LATE tick for the closed window must be dropped, not re-emitted
      mem.addData(Seq(tick("XOM", base + 180000L, 999.0)))
      q.processAllAvailable()
      val after = spark.table("wm_drop")
        .filter(col("window_start") === new java.sql.Timestamp(base))
        .select("label").as[Double].collect()
      assert(after.toSeq == Seq(150.0), "late row leaked into closed window")
    } finally q.stop()
  }

  test("sessionAgg emits closed sessions in streaming append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ticks.MarketTickTuple]
    val in = Ticks.withEventTime(mem.toDF().toDF("symbol", "timestamp",
      "source", "data_type", "bid", "ask", "price", "volume", "spread_raw",
      "spread_table", "volatility", "market_sentiment", "trading_activity"))
    val sessions = StreamOps.sessionAgg("event_time", "5 minutes",
      Seq("symbol"), Seq(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n")),
      watermark = Some("1 minute"))(in)
    val q = sessions.writeStream.format("memory").queryName("sess_t")
      .outputMode("append").start()
    try {
      // session 1: two ticks 1 min apart; then a tick far later closes it
      mem.addData(tick("XOM", base, 10.0), tick("XOM", base + 60000L, 11.0))
      q.processAllAvailable()
      mem.addData(tick("XOM", base + 3600000L, 12.0))
      q.processAllAvailable()
      val out = spark.table("sess_t")
      assert(out.count() == 1) // first session closed, second still open
      val r = out.collect().head
      assert(r.getAs[Long]("n") == 2L)
    } finally q.stop()
  }

  test("ParquetKeyedStore survives a leftover .tmp from a crashed write") {
    val dir = tmpDir("crash") + "/t"
    val store = new ParquetKeyedStore(dir, Seq("k"), "v")
    store.upsert(Seq(("a", 1L)).toDF("k", "v"))
    // simulate a crash that left a stale tmp dir behind
    val tmp = new java.io.File(dir + ".tmp")
    tmp.mkdirs()
    new java.io.File(tmp, "garbage").createNewFile()
    store.upsert(Seq(("a", 2L), ("b", 1L)).toDF("k", "v"))
    val out = store.read(spark).orderBy("k")
      .select("k", "v").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("a", 2L), ("b", 1L)))
  }

  test("HTML ingest twin: live file-drop stream == batch, gates fire (r12)") {
    // the r11 extraction kernels under micro-batch (r12 stretch):
    // pages land as JSON files in a bronze dir, the stream extracts
    // text/title/canonical URL and gates quality — all map-only, so
    // the streaming plan is accepted without state and must equal the
    // batch run on the same files row-for-row
    import graft.streaming.HtmlIngest
    val dir = java.nio.file.Files.createTempDirectory("html_land")
    def page(id: Long, body: String, url: String): String = {
      val html = ("<html><head><title>Page " + id + "</title></head>" +
        "<body><h1>H</h1><p>" + body + "</p></body></html>")
        .replace("\"", "\\\"")
      s"""{"doc_id":$id,"fetched_at":"2026-01-01T00:00:0$id","url":"$url","html":"$html"}"""
    }
    val rows = Seq(
      page(1L, "a perfectly ordinary paragraph of readable prose " +
        "with enough words to pass the quality gate comfortably",
        "HTTP://Example.COM:80/a?utm_source=x&id=1"),
      page(2L, "zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz",
        "https://example.com/rep"), // repetition-gated
      page(3L, "", "https://example.com/empty")) // markup-only: drops
    java.nio.file.Files.writeString(dir.resolve("batch0.json"),
      rows.take(1).mkString("\n"))
    val stream = HtmlIngest.ingest(
      HtmlIngest.htmlDirPages(spark, dir.toString, maxFilesPerTrigger = 1))
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("html_ingest")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // second drop AFTER the stream started: the dir is live
      java.nio.file.Files.writeString(dir.resolve("batch1.json"),
        rows.drop(1).mkString("\n"))
      q.processAllAvailable()
      val streamed = spark.table("html_ingest")
        .select("doc_id", "url_canon", "title", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3))).sortBy(_._1).toSeq
      // gates: doc 2 repetition-gated, doc 3 markup-only -> only doc 1
      assert(streamed.map(_._1) == Seq(1L), streamed.toString)
      assert(streamed.head._2 == "http://example.com/a?id=1")
      assert(streamed.head._3 == "Page 1")
      assert(streamed.head._4.contains("ordinary paragraph"))
      // batch twin over the same landing files, same transform
      val batch = HtmlIngest.ingest(
          spark.read.schema(HtmlIngest.pageSchema).json(dir.toString))
        .select("doc_id", "url_canon", "title", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3))).sortBy(_._1).toSeq
      assert(streamed == batch, s"stream $streamed != batch $batch")
    } finally q.stop()
  }

  test("WARC ingest twin: live .warc.gz file-drop stream == warcFiles (r14)") {
    // the archive landing pattern: .warc.gz files drop into a dir, a
    // binaryFile stream decodes each to records via the SAME walk as
    // the batch front door — zero streaming state, and the per-batch
    // rows must equal warcFiles on the same files row-for-row
    import graft.streaming.WarcIngest
    val dir = java.nio.file.Files.createTempDirectory("warc_land")
    def record(typ: String, uri: String, body: String): String =
      s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2024-01-02T00:00:00Z\r\n" +
        s"Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n"
    def writeGz(name: String, content: String): Unit = {
      val out = new java.util.zip.GZIPOutputStream(
        java.nio.file.Files.newOutputStream(dir.resolve(name)))
      out.write(content.getBytes("ISO-8859-1")); out.close()
    }
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<p>stream me</p>"
    writeGz("a.warc.gz",
      record("response", "https://s.com/1", http) +
        record("response", "https://s.com/2", http))
    val stream = WarcIngest.warcDirRecords(spark, dir.toString,
      maxFilesPerTrigger = 1)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("warc_ingest")
      .outputMode("append").start()
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select("path", "parse_ok", "rec_idx", "warc_type", "target_uri",
        "http_status", "body")
      .collect().map { r =>
        val path = r.getString(0)
        (path.substring(path.lastIndexOf('/') + 1), r.getBoolean(1),
          if (r.isNullAt(2)) -1 else r.getInt(2),
          r.getString(3), r.getString(4),
          if (r.isNullAt(5)) -1 else r.getInt(5),
          if (r.isNullAt(6)) null
          else new String(r.getAs[Array[Byte]](6), "ISO-8859-1"))
      }.sortBy(t => (t._1, t._3)).toSeq
    try {
      q.processAllAvailable()
      // live drops AFTER the stream started: a second archive and a
      // non-WARC file (must surface as ONE parse_ok=false row)
      writeGz("b.warc.gz", record("response", "https://s.com/3", http))
      writeGz("c.warc.gz", "this is not a WARC archive at all")
      q.processAllAvailable()
      val streamed = shape(spark.table("warc_ingest"))
      val batch = shape(graft.llm.Warc
        .warcFiles(spark, dir.toString + "/*.warc.gz"))
      assert(streamed.size == 4, streamed.toString) // 2 + 1 + 1 bad
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(streamed.count(!_._2) == 1) // the non-WARC file's row
    } finally q.stop()
  }

  test("csv fixture replays through the declared schema") {
    val fixture = "/root/reference/Deliverable_3/kafka_messages.csv"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(fixture)))
    val df = Ticks.readCsvFixture(spark, fixture)
    assert(df.count() == 4440)
    val repaired = Ticks.repairEthSentinels(df)
    assert(repaired.filter(col("price") === -1.0).count() == 0)
    // typed core round trip
    val typed = Ticks.asTicks(df)
    val symbols = typed.map(_.symbol).distinct().collect().toSet
    assert(symbols.contains("ETHEREUM") && symbols.size >= 4)
  }
}
