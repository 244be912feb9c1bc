package graft

import graft.streaming.Stateful
import graft.streaming.Stateful.{EwmaOut, PricePoint}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("ewmaPerSymbol carries state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PricePoint]
    val q = Stateful.ewmaPerSymbol(mem.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("ewma_t")
      .outputMode("append").start()
    try {
      mem.addData(PricePoint("XOM", 1L, 100.0), PricePoint("XOM", 2L, 110.0))
      q.processAllAvailable()
      mem.addData(PricePoint("XOM", 3L, 120.0), PricePoint("BP", 1L, 30.0))
      q.processAllAvailable()
      val out = spark.table("ewma_t").as[EwmaOut]
        .collect().sortBy(o => (o.symbol, o.timestamp))
      val xom = out.filter(_.symbol == "XOM").map(_.ewma)
      // 100 -> .5*110+.5*100=105 -> .5*120+.5*105=112.5 (state crossed batches)
      assert(xom.toSeq == Seq(100.0, 105.0, 112.5))
      assert(out.filter(_.symbol == "BP").map(_.ewma).toSeq == Seq(30.0))
      assert(out.filter(_.symbol == "XOM").map(_.n).toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("ewmaPerSymbol drops state after an event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mem = MemoryStream[PricePoint]
    val base = 1736081400000L
    val withWm = mem.toDS()
      .withColumn("event_time", (col("timestamp") / 1000).cast("timestamp"))
      .withWatermark("event_time", "10 seconds")
      .as[PricePoint]
    val q = Stateful.ewmaPerSymbol(withWm, alpha = 0.5,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      timeoutMs = 1000L)
      .writeStream.format("memory").queryName("ewma_et")
      .outputMode("append").start()
    try {
      mem.addData(PricePoint("XOM", base, 100.0))
      q.processAllAvailable()
      // advance the watermark past XOM's timeout with another key...
      mem.addData(PricePoint("BP", base + 30000L, 30.0))
      q.processAllAvailable()
      // ...then fire the timeout in a batch where XOM has no data (a
      // key WITH data in a batch is handled as live, not timed out)
      mem.addData(PricePoint("BP", base + 31000L, 31.0))
      q.processAllAvailable()
      mem.addData(PricePoint("XOM", base + 40000L, 200.0))
      q.processAllAvailable()
      val xom = spark.table("ewma_et").as[EwmaOut]
        .collect().filter(_.symbol == "XOM").sortBy(_.timestamp)
      // fresh state after the event-time timeout: ewma restarts
      assert(xom.map(_.ewma).toSeq == Seq(100.0, 200.0))
      assert(xom.map(_.n).toSeq == Seq(1L, 1L))
    } finally q.stop()
  }

  test("ewmaPerSymbol drops state after a processing-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PricePoint]
    // NOTE: with ProcessingTimeTimeout the engine keeps running no-data
    // batches (shouldRunAnotherBatch is always true once wall-clock
    // advances), so processAllAvailable() never sees "no new data" and
    // would block forever — synchronize by polling the sink instead.
    val q = Stateful.ewmaPerSymbol(mem.toDS(), alpha = 0.5,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      timeoutMs = 200L)
      .writeStream.format("memory").queryName("ewma_to")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
      .start()
    def xomRows(): Seq[EwmaOut] = spark.table("ewma_to").as[EwmaOut]
      .collect().filter(_.symbol == "XOM").sortBy(_.timestamp).toSeq
    def awaitSink(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 30000L
      while (xomRows().size < n && System.currentTimeMillis() < deadline)
        Thread.sleep(50L)
      assert(xomRows().size == n, s"sink never reached $n XOM rows")
    }
    try {
      mem.addData(PricePoint("XOM", 1L, 100.0))
      awaitSink(1)
      // the continuous no-data batches fire XOM's 200ms inactivity
      // timeout on their own; wait well past it before the next tick
      Thread.sleep(1500L)
      mem.addData(PricePoint("XOM", 2L, 200.0))
      awaitSink(2)
      val xom = xomRows()
      // fresh state after the timeout: ewma restarts at the raw price
      assert(xom.map(_.ewma) == Seq(100.0, 200.0))
      assert(xom.map(_.n) == Seq(1L, 1L))
    } finally q.stop()
  }

  test("batch Sessions.ewma == streaming ewmaPerSymbol, bit-for-bit") {
    import org.apache.spark.sql.functions.col
    // irrational-ish doubles so any summation-order difference between
    // the batch fold and the streaming recurrence would show up
    val pts = Seq(
      ("XOM", 1L, 100.37), ("XOM", 2L, 99.113), ("XOM", 3L, 101.77),
      ("XOM", 4L, 98.031), ("BP", 1L, 30.29), ("BP", 2L, 31.444))
    val batch = graft.operators.Sessions.ewma(
      pts.toDF("symbol", "timestamp", "price"),
      "symbol", Seq("timestamp"), "price", alpha = 0.3)
      .select("symbol", "timestamp", "ewma")
      .as[(String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val stream = Stateful.ewmaPerSymbol(
      pts.map(p => PricePoint(p._1, p._2, p._3)).toDS(), alpha = 0.3)
      .collect().map(o => (o.symbol, o.timestamp, o.ewma))
      .sortBy(r => (r._1, r._2))
    // == on doubles: the two paths must agree to the last ulp
    assert(batch.toSeq == stream.toSeq)
    // hand check the recurrence head
    assert(batch(0)._3 == 30.29 &&
      batch(1)._3 == 0.3 * 31.444 + 0.7 * 30.29)
  }

  test("Sessions.holt matches a driver-side fold bit-for-bit; trend locks a line") {
    import org.apache.spark.sql.functions.col
    val xs = Seq(3.7, 9.113, 4.77, 12.031, 8.29, 15.444)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("k", "t", "v")
    val got = graft.operators.Sessions
      .holt(df, "k", Seq("t"), "v", 0.3, 0.1)
      .select("t", "level", "trend", "forecast")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    var l = xs.head; var b = 0.0
    val want = xs.zipWithIndex.map { case (x, i) =>
      if (i > 0) {
        val lNew = 0.3 * x + 0.7 * (l + b)
        b = 0.1 * (lNew - l) + 0.9 * b
        l = lNew
      }
      (i.toLong, l, b, l + b)
    }
    assert(got.toSeq == want)
    // a pure line is eventually tracked: level ~ x, trend ~ slope
    val line = (0 until 200).map(i => ("k", i.toLong, 2.0 * i + 5.0))
      .toDF("k", "t", "v")
    val tail = graft.operators.Sessions
      .holt(line, "k", Seq("t"), "v", 0.3, 0.1)
      .filter(col("t") === 199L)
      .select("level", "trend").as[(Double, Double)].head()
    assert(math.abs(tail._1 - (2.0 * 199 + 5.0)) < 0.5 &&
      math.abs(tail._2 - 2.0) < 0.05)
  }

  test("Sessions.ewma restarts per key and rejects null values") {
    import org.apache.spark.sql.functions.col
    val two = graft.operators.Sessions.ewma(
      Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 1L, 5.0))
        .toDF("k", "t", "v"), "k", Seq("t"), "v", 0.5)
      .select("k", "ewma").as[(String, Double)]
      .collect().sortBy(identity).toSeq
    assert(two == Seq(("a", 10.0), ("a", 15.0), ("b", 5.0)))
    val bad = Seq(("a", 1L, Some(1.0)), ("a", 2L, None))
      .toDF("k", "t", "v")
    val e = intercept[org.apache.spark.SparkException] {
      graft.operators.Sessions.ewma(bad, "k", Seq("t"), "v", 0.5)
        .collect()
    }
    assert(e.getMessage.contains("ewma") ||
      Option(e.getCause).exists(_.getMessage.contains("ewma")))
  }

  test("holtWintersPerSymbol: stream replay == batch fold, bit-identical") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(9)
    val series = (1 to 30).map(i =>
      PricePoint("A", i.toLong, 50.0 + rng.nextInt(100))) ++
      (1 to 5).map(i => PricePoint("B", i.toLong, 10.0 * i))
    val mem = MemoryStream[Stateful.PricePoint]
    val q = Stateful.holtWintersPerSymbol(mem.toDS(),
        alpha = 0.5, beta = 0.25, gamma = 0.125, period = 7)
      .writeStream.format("memory").queryName("hw_t")
      .outputMode("append").start()
    try {
      // deliver in event order across three micro-batches
      val ordered = series.sortBy(p => (p.symbol, p.timestamp))
      ordered.grouped(12).foreach { g =>
        mem.addData(g: _*); q.processAllAvailable()
      }
      val got = spark.table("hw_t").as[Stateful.HwOut]
        .collect().sortBy(o => (o.symbol, o.timestamp))
        .map(o => (o.symbol, o.timestamp, o.level, o.trend, o.forecast))
      val batch = graft.operators.Sessions.holtWinters(
          series.map(p => (p.symbol, p.timestamp, p.price))
            .toDF("symbol", "ts", "price"),
          "symbol", Seq("ts"), "price", 0.5, 0.25, 0.125, 7)
        .orderBy("symbol", "ts")
        .collect().map(r => (r.getAs[String]("symbol"),
          r.getAs[Long]("ts"), r.getAs[Double]("level"),
          r.getAs[Double]("trend"), r.getAs[Double]("forecast")))
      assert(got.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("decayedCounter: state crosses batches and telescopes to the batch sum") {
    implicit val sqlCtx = spark.sqlContext
    import Stateful.{DecayEvent, DecayOut}
    val day = 86400000L
    val hl = 7L * day
    val base = 1736081400000L
    val mem = MemoryStream[DecayEvent]
    val q = Stateful.decayedCounter(mem.toDS(), halfLifeMs = hl)
      .writeStream.format("memory").queryName("decay_t")
      .outputMode("append").start()
    try {
      mem.addData(DecayEvent("k", base, 1.0),
        DecayEvent("k", base + 7 * day, 1.0))
      q.processAllAvailable()
      mem.addData(DecayEvent("k", base + 14 * day, 1.0),
        DecayEvent("j", base, 1.0))
      q.processAllAvailable()
      val out = spark.table("decay_t").as[DecayOut]
        .collect().sortBy(o => (o.key, o.timestamp))
      val k = out.filter(_.key == "k").map(_.decayed)
      // 1 -> 1*0.5 + 1 = 1.5 -> 1.5*0.5 + 1 = 1.75 (exact halves)
      assert(k.toSeq == Seq(1.0, 1.5, 1.75))
      assert(out.filter(_.key == "j").map(_.decayed).toSeq == Seq(1.0))
      // telescopes to the batch operator: anchor = key's last event
      val batch = graft.operators.Sessions.decayedCounts(
        Seq(("k", new java.sql.Timestamp(base)),
          ("k", new java.sql.Timestamp(base + 7 * day)),
          ("k", new java.sql.Timestamp(base + 14 * day)))
          .toDF("g", "ts"), "g", "ts", 7.0)
        .collect().head.getAs[Double]("decayed_count")
      assert(math.abs(k.last - batch) < 1e-9)
    } finally q.stop()
  }

  test("decayedCounter: out-of-order within a batch sorts; older-than-state folds forward") {
    implicit val sqlCtx = spark.sqlContext
    import Stateful.{DecayEvent, DecayOut}
    val hl = 1000L
    val mem = MemoryStream[DecayEvent]
    val q = Stateful.decayedCounter(mem.toDS(), halfLifeMs = hl)
      .writeStream.format("memory").queryName("decay_ooo")
      .outputMode("append").start()
    try {
      // arrive out of order inside one batch: sorted -> 0, 1000, 2000
      mem.addData(DecayEvent("k", 2000L, 1.0), DecayEvent("k", 0L, 1.0),
        DecayEvent("k", 1000L, 1.0))
      q.processAllAvailable()
      val first = spark.table("decay_ooo").as[DecayOut]
        .collect().sortBy(_.timestamp).map(_.decayed)
      assert(first.toSeq == Seq(1.0, 1.5, 1.75))
      // a LATE event older than the carried state folds in forward:
      // mass never un-decays (dt clamps at 0)
      mem.addData(DecayEvent("k", 500L, 1.0))
      q.processAllAvailable()
      val all = spark.table("decay_ooo").as[DecayOut]
        .collect().sortBy(_.n).map(_.decayed)
      assert(all.last == 1.75 + 1.0)
    } finally q.stop()
  }

  test("touchAttributionStream == batch touchAttribution on an in-order replay") {
    implicit val sqlCtx = spark.sqlContext
    import Stateful.{TouchEvent, TouchOut}
    // fixture covers: conversion with no prior touch (direct), touch
    // updates between conversions, consecutive conversions crediting
    // the same pair, a tie broken by the tie column, multiple keys
    val fixture = Seq(
      TouchEvent("u1", 1000L, "purchase", 10.0),          // direct/direct
      TouchEvent("u1", 2000L, "email", 0.0),
      TouchEvent("u1", 3000L, "ad", 0.0),
      TouchEvent("u1", 4000L, "purchase", 20.0),          // last=ad first=email
      TouchEvent("u1", 5000L, "purchase", 5.0),           // same pair again
      TouchEvent("u2", 1000L, "social", 0.0, tie = 1L),
      TouchEvent("u2", 1000L, "email", 0.0, tie = 2L),    // tie: email is later
      TouchEvent("u2", 2000L, "purchase", 7.0),           // last=email first=social
      TouchEvent("u3", 9000L, "ad", 0.0))                 // touch, never converts
    val mem = MemoryStream[TouchEvent]
    val q = Stateful.touchAttributionStream(mem.toDS(), "purchase")
      .writeStream.format("memory").queryName("touch_t")
      .outputMode("append").start()
    try {
      // split mid-journey so u1's touch state must cross batches
      val (b1, b2) = fixture.sortBy(e => (e.timestamp, e.tie))
        .partition(_.timestamp <= 2000L)
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("touch_t").as[TouchOut].collect()
        .groupBy(o => (o.model, o.channel))
        .map { case (k, v) => k -> (v.length.toLong,
          math.rint(v.map(_.value).sum * 100) / 100) }
      val batch = graft.operators.Sessions.touchAttribution(
        fixture.map(e => (e.key, new java.sql.Timestamp(e.timestamp),
          e.eventType, e.value, e.tie))
          .toDF("user_id", "ts", "etype", "value", "tie"),
        "user_id", "ts", "etype", "purchase", Seq($"tie"))
        .collect()
        .map(r => (r.getAs[String]("model"), r.getAs[String]("channel")) ->
          (r.getAs[Long]("n_conversions"),
            r.getAs[Double]("attributed_value"))).toMap
      assert(got == batch, s"\nstream=$got\nbatch=$batch")
      // spot-check the fixture semantics themselves
      assert(batch(("last_touch", "direct")) == (1L, 10.0))
      assert(batch(("last_touch", "ad")) == (2L, 25.0))
      assert(batch(("first_touch", "email")) == (2L, 25.0))
      assert(batch(("first_touch", "social")) == (1L, 7.0))
    } finally q.stop()
  }

  test("multiTouchAttributionStream == batch fractional models, cross-batch") {
    implicit val sqlCtx = spark.sqlContext
    import Stateful.{TouchEvent, MultiTouchOut}
    // journeys cover: direct (no prior touch), 1-touch (weight 1),
    // 2-touch (50/50), 4-touch U-shape (0.4/0.1/0.1/0.4 positions,
    // decay over multi-day ages), consecutive conversions off the
    // same journey, and a (ts, tie) tie on the touch side
    val day = 86400000L
    val fixture = Seq(
      TouchEvent("u1", 1000L, "purchase", 10.0),            // direct
      TouchEvent("u1", 2000L, "email", 0.0),
      TouchEvent("u1", 1 * day, "purchase", 20.0),          // 1-touch
      TouchEvent("u2", 1000L, "social", 0.0, tie = 1L),
      TouchEvent("u2", 1000L, "email", 0.0, tie = 2L),
      TouchEvent("u2", 2 * day, "purchase", 8.0),           // 2-touch
      TouchEvent("u3", 1000L, "ad", 0.0),
      TouchEvent("u3", 1 * day, "email", 0.0),
      TouchEvent("u3", 2 * day, "social", 0.0),
      TouchEvent("u3", 3 * day, "search", 0.0),
      TouchEvent("u3", 4 * day, "purchase", 40.0),          // U-shape
      TouchEvent("u3", 4 * day + 1000L, "purchase", 4.0))   // again
    val mem = MemoryStream[TouchEvent]
    val q = Stateful.multiTouchAttributionStream(mem.toDS(), "purchase",
      halfLifeDays = 7.0)
      .writeStream.format("memory").queryName("mtouch_t")
      .outputMode("append").start()
    try {
      // split mid-journey: u3's first two touches land in batch 1
      val (b1, b2) = fixture.sortBy(e => (e.timestamp, e.tie))
        .partition(_.timestamp <= 1 * day)
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      def r6(x: Double) = math.rint(x * 1e6) / 1e6
      val got = spark.table("mtouch_t").as[MultiTouchOut].collect()
        .groupBy(o => (o.model, o.channel))
        .map { case (k, v) => k -> (r6(v.map(_.weight).sum),
          r6(v.map(o => o.weight * o.value).sum)) }
      val batch = graft.operators.Sessions.multiTouchAttribution(
        fixture.map(e => (e.key, new java.sql.Timestamp(e.timestamp),
          e.eventType, e.value, e.tie))
          .toDF("user_id", "ts", "etype", "value", "tie"),
        "user_id", "ts", "etype", "purchase", "tie")
        .collect()
        .map(r => (r.getAs[String]("model"), r.getAs[String]("channel")) ->
          (r.getAs[Double]("attributed_conversions"),
            r.getAs[Double]("attributed_value"))).toMap
      assert(got == batch, s"\nstream=$got\nbatch=$batch")
      // pin the fixture semantics: U-shape ends get 0.4 each (u3's
      // two conversions), middles split the 0.2
      assert(batch(("position", "ad")) == (0.8, 17.6))
      assert(batch(("position", "direct")) == (1.0, 10.0))
      assert(batch(("position", "email")) == (1.7, 28.4))
      // both models conserve mass: weights per conversion sum to 1,
      // so channel totals sum to the 5 conversions
      def modelMass(m: String) = r6(batch.collect {
        case ((`m`, _), (w, _)) => w }.sum)
      assert(modelMass("position") == 5.0)
      assert(modelMass("time_decay") == 5.0)
      // within u3's journey, recency must order the decay raws:
      // search (1 day old) outweighs ad (4 days old) per conversion
      assert(batch(("time_decay", "search"))._1 >
        batch(("time_decay", "ad"))._1)
    } finally q.stop()
  }

  test("multiTouchAttributionStream spill rule pins first + recent tail") {
    implicit val sqlCtx = spark.sqlContext
    import Stateful.{TouchEvent, MultiTouchOut}
    // 5 touches under maxTouches=4: t2 (oldest middle) must drop;
    // retained journey = t1, t3, t4, t5 -> U-shape 0.4/0.1/0.1/0.4
    val events = (1 to 5).map(i =>
      TouchEvent("u", i * 1000L, s"ch$i", 0.0)) :+
      TouchEvent("u", 9000L, "purchase", 10.0)
    val mem = MemoryStream[TouchEvent]
    val q = Stateful.multiTouchAttributionStream(mem.toDS(), "purchase",
      maxTouches = 4)
      .writeStream.format("memory").queryName("mtouch_spill")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val pos = spark.table("mtouch_spill").as[MultiTouchOut].collect()
        .filter(_.model == "position")
        .map(o => o.channel -> o.weight).toMap
      assert(!pos.contains("ch2"))
      assert(pos == Map("ch1" -> 0.4, "ch3" -> 0.1, "ch4" -> 0.1,
        "ch5" -> 0.4))
    } finally q.stop()
  }
}
