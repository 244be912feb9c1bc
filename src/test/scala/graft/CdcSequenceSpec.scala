package graft

import org.apache.spark.sql.functions._

/** Round-9 operators: SCD2 historization, event-transition matrix,
  * MAD outlier profile. */
class CdcSequenceSpec extends SparkSpec {
  import spark.implicits._

  test("transitionMatrix: counts and row-normalized probabilities") {
    val df = Seq(
      (1L, 1, "A"), (1L, 2, "B"), (1L, 3, "B"), (1L, 4, "C"),
      (2L, 1, "A"), (2L, 2, "B"), (2L, 3, "A")
    ).toDF("k", "t", "st")
    val out = graft.operators.Sessions
      .transitionMatrix(df, "k", "t", "st")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(out == Set(
      ("A", "B", 2L, 1.0),
      ("B", "B", 1L, 0.333333),
      ("B", "C", 1L, 0.333333),
      ("B", "A", 1L, 0.333333)))
  }

  test("transitionMatrix: probabilities sum to ~1 per from_state; partition-independent") {
    val df = spark.range(2000).select(
      (col("id") % 37).as("k"), col("id").as("t"),
      (col("id") * 7919 % 5).cast("string").as("st"))
    val a = graft.operators.Sessions.transitionMatrix(df, "k", "t", "st")
    val sums = a.groupBy("from_state").agg(sum("p").as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.nonEmpty && sums.forall(s => math.abs(s - 1.0) < 1e-4))
    val b = graft.operators.Sessions
      .transitionMatrix(df.repartition(13), "k", "t", "st")
    assert(a.orderBy("from_state", "to_state").collect()
      .sameElements(b.orderBy("from_state", "to_state").collect()))
  }

  test("madOutliers: hand-computed median/MAD/outlier count") {
    val df = Seq(
      ("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0), ("g", 100.0),
      ("h", 10.0), ("h", 10.0), ("h", 10.0)
    ).toDF("grp", "v")
    val out = graft.operators.Aggregates
      .madOutliers(df, Seq("grp"), "v", 3.0)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSet
    // g: median 3, devs {2,1,0,1,97} -> mad 1; only 100 exceeds
    // 3*1.4826*1 = 4.4478. h: mad 0 -> a zero deviation is NOT > 0.
    assert(out == Set(
      ("g", 3.0, 1.0, 1L, 5L),
      ("h", 10.0, 0.0, 0L, 3L)))
  }

  test("scd2: run-length semantics — a re-observed value reopens a new interval") {
    val df = Seq(
      ("u1", 1, "A"), ("u1", 2, "A"), ("u1", 3, "B"),
      ("u1", 4, "A"), ("u1", 5, "A"),
      ("u2", 1, "X")
    ).toDF("k", "t", "st")
    val out = graft.etl.Cdc.scd2(df, "k", "t", Seq("st"))
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        Option(r.get(4)).map(_.asInstanceOf[Int]),
        r.getBoolean(5), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("u1", "A", 1, Some(3), false, 2L),
      ("u1", "B", 3, Some(4), false, 1L),
      ("u1", "A", 4, None, true, 2L),
      ("u2", "X", 1, None, true, 1L)))
  }

  test("scd2: a null attribute is a tracked value, not a wildcard") {
    val df = Seq(
      ("u", 1, Some("A")), ("u", 2, None: Option[String]),
      ("u", 3, None: Option[String]), ("u", 4, Some("A"))
    ).toDF("k", "t", "st")
    val out = graft.etl.Cdc.scd2(df, "k", "t", Seq("st"))
      .orderBy("valid_from")
      .collect()
      .map(r => (Option(r.getString(1)), r.getInt(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (Some("A"), 1, 1L), (None, 2, 2L), (Some("A"), 4, 1L)))
  }

  test("association: independent table scores 0, perfect association scores N and ln2") {
    import graft.operators.Aggregates
    val indep = Seq.tabulate(20)(i =>
      (if (i % 2 == 0) "x" else "y", if (i % 4 < 2) "u" else "v"))
      .toDF("a", "b")
    val r1 = Aggregates.association(indep, "a", "b").collect().head
    assert(r1.getAs[Long]("n") == 20L && r1.getAs[Long]("dof") == 1L)
    assert(r1.getAs[Double]("chi2") == 0.0)
    assert(r1.getAs[Double]("mutual_info") == 0.0)
    val dep = Seq.tabulate(20)(i =>
      (if (i % 2 == 0) "x" else "y", if (i % 2 == 0) "u" else "v"))
      .toDF("a", "b")
    val r2 = Aggregates.association(dep, "a", "b").collect().head
    assert(r2.getAs[Double]("chi2") == 20.0)
    assert(math.abs(r2.getAs[Double]("mutual_info") - math.log(2)) < 1e-5)
  }

  test("groupOls: recovers an exact line; degenerate x yields nulls") {
    import graft.operators.Aggregates
    val line = Seq.tabulate(10)(i => ("g", i.toDouble, 2.0 * i + 1.0))
      .toDF("k", "x", "y")
    val r = Aggregates.groupOls(line, Seq("k"), "x", "y").collect().head
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 1.0)
    assert(r.getAs[Double]("r2") == 1.0 && r.getAs[Long]("n") == 10L)
    val flat = Seq(("g", 1.0, 2.0), ("g", 1.0, 5.0)).toDF("k", "x", "y")
    val rf = Aggregates.groupOls(flat, Seq("k"), "x", "y").collect().head
    assert(rf.isNullAt(rf.fieldIndex("slope")),
      "var(x)=0 must yield null, not Infinity")
  }

  test("histogram: equi-width bins tile [min,max], max closes the last bin") {
    import graft.operators.Aggregates
    val df = (0 until 10).map(_.toDouble).toDF("v")
    val bins = Aggregates.histogram(df, "v", 5)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(bins.length == 5)
    assert(bins.forall(_._4 == 2L), bins.mkString(","))
    assert(bins.head._2 == 0.0 && bins.last._3 == 9.0)
    // constant column: everything lands in bin 0, no NaN bins
    val const = Seq(3.0, 3.0, 3.0).toDF("v")
    val cb = Aggregates.histogram(const, "v", 4).collect()
    assert(cb.length == 1 && cb.head.getLong(0) == 0L &&
      cb.head.getLong(3) == 3L)
  }

  test("scd2Merge == full recompute for append-in-time batches; untouched keys pass through") {
    val df = spark.range(4000).select(
      (col("id") % 101).as("k"), col("id").as("t"),
      (col("id") * 2654435761L % 3).cast("string").as("st"))
    // time split: every batch row is later than every history row
    val hist = graft.etl.Cdc.scd2(df.filter(col("id") < 3000),
      "k", "t", Seq("st"))
    val merged = graft.etl.Cdc.scd2Merge(hist,
      df.filter(col("id") >= 3000), "k", "t", Seq("st"))
    val full = graft.etl.Cdc.scd2(df, "k", "t", Seq("st"))
    assert(merged.orderBy("k", "valid_from").collect()
      .sameElements(full.orderBy("k", "valid_from").collect()))
    // a batch touching ONE key must leave every other key's rows
    // byte-identical (the anti-join passthrough)
    val one = df.filter(col("id") === 3999)
    val m1 = graft.etl.Cdc.scd2Merge(hist, one, "k", "t", Seq("st"))
    val k0 = one.select("k").collect().head.getLong(0)
    assert(m1.filter(col("k") =!= k0).orderBy("k", "valid_from").collect()
      .sameElements(hist.filter(col("k") =!= k0)
        .orderBy("k", "valid_from").collect()))
  }

  test("topPaths: counts first-k sequences; short keys keep short paths; partition-independent") {
    import graft.operators.Sessions
    val df = Seq(
      (1L, 1, "a"), (1L, 2, "b"), (1L, 3, "c"), (1L, 4, "d"),
      (2L, 1, "a"), (2L, 2, "b"), (2L, 3, "c"),
      (3L, 1, "a"), (3L, 2, "b"),
      (4L, 1, "x")
    ).toDF("k", "t", "et")
    val out = Sessions.topPaths(df, "k", "t", "et", pathLen = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // the 4th event of key 1 is ignored; key 3's path stops at 2
    assert(out == Map("a->b->c" -> 2L, "a->b" -> 1L, "x" -> 1L), out)
    val shuffled = Sessions.topPaths(df.repartition(7), "k", "t", "et",
      pathLen = 3).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(shuffled == out)
  }

  test("seasonalBaseline: perfect seasonal signal backtests to MAE 0") {
    import graft.operators.Aggregates
    def ts(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d $h%02d:00:00")
    // value depends only on hour-of-day -> the hour-mean model is exact
    val rows = for (d <- 1 to 6; h <- Seq(9, 12, 15))
      yield ("g", ts(d, h), h * 2.0)
    val df = rows.toDF("k", "t", "v")
    val r = Aggregates.seasonalBaseline(
      df.filter(col("t") < lit("2024-03-05").cast("timestamp")),
      df.filter(col("t") >= lit("2024-03-05").cast("timestamp")),
      Seq("k"), "t", "v").collect().head
    assert(r.getAs[Double]("mae") == 0.0 && r.getAs[Long]("n_test") == 6L)
  }

  test("psi: identical samples ~0, a shifted sample scores large, out-of-range lands in edge bins") {
    import graft.operators.Aggregates
    val base = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = Aggregates.psi(base, base, "v").collect().head
    assert(same.getAs[Double]("psi") < 1e-9, same.toString)
    // hard shift: mass moves to the top bins + beyond the range
    val shifted = (1 to 1000).map(i => (i % 100) + 150.0).toDF("v")
    val drift = Aggregates.psi(base, shifted, "v").collect().head
    assert(drift.getAs[Double]("psi") > 1.0, drift.toString)
    // out-of-range actual values must be COUNTED (edge bins), so the
    // actual shares still sum to ~1 and the score is finite
    assert(!drift.getAs[Double]("psi").isInfinite)
  }

  test("gini: equality scores 0, single holder scores (n-1)/n, bucket-invariant") {
    import graft.operators.Aggregates
    val equal = Seq.fill(50)(10.0).toDF("v")
    assert(Aggregates.gini(equal, "v").collect().head
      .getAs[Double]("gini") == 0.0)
    val oneHolder = (Seq.fill(9)(0.0) :+ 100.0).toDF("v")
    assert(Aggregates.gini(oneHolder, "v").collect().head
      .getAs[Double]("gini") == 0.9)
    val skewed = (1 to 100).map(i => math.pow(i.toDouble, 3)).toDF("v")
    val g1 = Aggregates.gini(skewed, "v", buckets = 1).collect().head
      .getAs[Double]("gini")
    val g9 = Aggregates.gini(skewed, "v", buckets = 9).collect().head
      .getAs[Double]("gini")
    assert(g1 == g9 && g1 > 0.4 && g1 < 0.8, s"$g1 vs $g9")
  }

  test("entropy: uniform 4-way = ln 4, single category = 0") {
    import graft.operators.Aggregates
    val df = Seq.tabulate(40)(i => ("u", s"c${i % 4}"))
      .toDF("k", "c")
      .union(Seq.fill(10)(("m", "only")).toDF("k", "c"))
    val out = Aggregates.entropy(df, Seq("k"), "c").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(math.abs(out("u")._1 - math.log(4)) < 1e-5)
    assert(out("u")._2 == 4L)
    assert(out("m") == (0.0, 1L))
  }

  test("wilsonInterval: CI brackets the rate and stays inside [0,1] at the extremes") {
    import graft.operators.Aggregates
    val df = Seq.tabulate(100)(i => ("g", i < 30))
      .union(Seq.tabulate(10)(_ => ("z", true)))
      .toDF("k", "hit")
    val out = Aggregates.wilsonInterval(df, Seq("k"), "hit").collect()
      .map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val (rate, lo, hi) = out("g")
    assert(rate == 0.3 && lo < rate && rate < hi && lo > 0.2 && hi < 0.4)
    // all-success small sample: a normal interval would exceed 1
    val (r1, lo1, hi1) = out("z")
    assert(r1 == 1.0 && hi1 <= 1.0 && lo1 > 0.6)
  }

  test("mergeAggregates == full recompute; keys only in one side survive") {
    import graft.etl.Cdc
    val df = spark.range(3000).select(
      (col("id") % 7).as("k"), (col("id") % 500).cast("double").as("v"))
    def aggOf(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("mn"), max("v").as("mx"))
    val gold = aggOf(df.filter(col("id") < 2000))
    val batch = aggOf(df.filter(col("id") >= 2000)
      .union(spark.range(1).select(lit(99L).as("k"), lit(5.0).as("v"))))
    val merged = Cdc.mergeAggregates(gold, batch, Seq("k"),
      sumCols = Seq("n", "s"), minCols = Seq("mn"), maxCols = Seq("mx"))
    val full = aggOf(df.union(
      spark.range(1).select(lit(99L).as("k"), lit(5.0).as("v"))))
    assert(merged.orderBy("k").collect()
      .sameElements(full.orderBy("k").collect()))
    // the batch-only key arrives intact
    assert(merged.filter(col("k") === 99L).count() == 1)
  }

  test("welchTTest: known-shift samples score a positive t; degenerate inputs yield nulls") {
    import graft.operators.Aggregates
    val a = (1 to 50).map(i => 10.0 + (i % 5)).toDF("v")
    val b = (1 to 50).map(i => 8.0 + (i % 5)).toDF("v")
    val r = Aggregates.welchTTest(a, b, "v").collect().head
    assert(r.getAs[Double]("mean_a") - r.getAs[Double]("mean_b") == 2.0)
    assert(r.getAs[Double]("t_stat") > 5.0, r.toString)
    assert(r.getAs[Double]("deg_f") > 90.0 && r.getAs[Double]("deg_f") <= 98.0)
    // constant samples: zero pooled variance must yield null, not Inf
    val c = Seq(1.0, 1.0, 1.0).toDF("v")
    val rc = Aggregates.welchTTest(c, c, "v").collect().head
    assert(rc.isNullAt(rc.fieldIndex("t_stat")))
    assert(rc.isNullAt(rc.fieldIndex("deg_f")))
  }

  test("ksTwoSample: hand-computed D, identical samples score 0, bucketing-invariant") {
    import graft.operators.Aggregates
    // A = {1,2,3,4}, B = {3,4,5,6}: D peaks at x=2 (F_A=0.5, F_B=0) = 0.5
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val r = Aggregates.ksTwoSample(a, b, "v").collect().head
    assert(r.getAs[Double]("ks_stat") == 0.5, r.toString)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    // identical distributions: D = 0
    val same = Aggregates.ksTwoSample(a, a, "v").collect().head
    assert(same.getAs[Double]("ks_stat") == 0.0)
    // the two-level decomposition must not depend on bucket count
    val r1 = Aggregates.ksTwoSample(a, b, "v", buckets = 1).collect().head
    val r7 = Aggregates.ksTwoSample(a, b, "v", buckets = 7).collect().head
    assert(r1.getAs[Double]("ks_stat") == 0.5 &&
      r7.getAs[Double]("ks_stat") == 0.5)
  }

  test("basketLift: hand-computed support and lift; perfect pair tops chance pair") {
    import graft.operators.Aggregates
    // 4 baskets: {x,y} {x,y} {x,z} {y,z} -> n=4
    // xy: n_ab=2, n_x=3, n_y=3 -> lift = 2*4/9 = 0.888889
    // xz: 1*4/(3*2) = 0.666667 ; yz: 1*4/(3*2) = 0.666667
    val df = Seq(
      (1, "x"), (1, "y"), (2, "x"), (2, "y"),
      (3, "x"), (3, "z"), (4, "y"), (4, "z")
    ).toDF("b", "i")
    val out = Aggregates.basketLift(df, "b", "i").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(5), r.getDouble(6)))).toMap
    assert(out(("x", "y")) == (2L, 0.5, 0.888889))
    assert(out(("x", "z")) == (1L, 0.25, 0.666667))
    assert(out(("y", "z")) == (1L, 0.25, 0.666667))
    // duplicate items inside a basket must not inflate counts
    val dup = df.union(Seq((1, "x"), (1, "x")).toDF("b", "i"))
    val o2 = Aggregates.basketLift(dup, "b", "i").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(o2(("x", "y")) == 2L)
  }

  test("funnelLatency: deltas only among converters, exact medians") {
    import graft.operators.Sessions
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1 converts view->click in 60s, click->buy in 120s
      (1L, ts("2024-03-01 10:00:00"), "view"),
      (1L, ts("2024-03-01 10:01:00"), "click"),
      (1L, ts("2024-03-01 10:03:00"), "buy"),
      // u2 converts view->click in 180s, never buys
      (2L, ts("2024-03-01 11:00:00"), "view"),
      (2L, ts("2024-03-01 11:03:00"), "click"),
      // u3 clicks BEFORE viewing: no conversion
      (3L, ts("2024-03-01 12:01:00"), "click"),
      (3L, ts("2024-03-01 12:02:00"), "view")
    ).toDF("k", "t", "et")
    val out = Sessions.funnelLatency(ev, "k", "t", "et",
        Seq("view", "click", "buy"))
      .orderBy("step_idx").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("view->click", 2L, 120.0, 120.0),
      ("click->buy", 1L, 120.0, 120.0)), s"got ${out.toSeq}")
  }

  test("peakConcurrency: end-exclusive peaks, midnight carry across days") {
    import graft.operators.Sessions
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val iv = Seq(
      // day 1: A and B overlap (peak 2); C starts exactly as A ends
      (ts("2024-03-01 10:00:00"), ts("2024-03-01 12:00:00")), // A
      (ts("2024-03-01 11:00:00"), ts("2024-03-01 11:30:00")), // B
      (ts("2024-03-01 12:00:00"), ts("2024-03-01 13:00:00")), // C: touches A only
      // D spans midnight; E overlaps D on day 2 -> day-2 peak 2
      (ts("2024-03-01 22:00:00"), ts("2024-03-02 02:00:00")), // D
      (ts("2024-03-02 01:00:00"), ts("2024-03-02 03:00:00"))  // E
    ).toDF("s", "e")
    val out = Sessions.peakConcurrency(iv, "s", "e")
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(out.toSeq == Seq(("2024-03-01", 2L), ("2024-03-02", 2L)),
      s"got ${out.toSeq}")
    // touching-only intervals never stack (end-exclusive)
    val touch = Seq(
      (ts("2024-03-01 10:00:00"), ts("2024-03-01 11:00:00")),
      (ts("2024-03-01 11:00:00"), ts("2024-03-01 12:00:00"))
    ).toDF("s", "e")
    val p = Sessions.peakConcurrency(touch, "s", "e").collect()
      .map(_.getLong(1))
    assert(p.toSeq == Seq(1L))
  }

  test("histogramEquiDepth: near-equal bucket depths, cutpoint values close the lower bin") {
    import graft.operators.Aggregates
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val bins = Aggregates.histogramEquiDepth(df, "v", 4)
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1)))
    // cutpoints for 1..100 at .25/.5/.75 are 25.75/50.5/75.25 -> 4x25
    assert(bins.toSeq == Seq((0L, 25L), (1L, 25L), (2L, 25L), (3L, 25L)))
    // heavy ties: a value equal to a cutpoint lands in the LOWER bin
    val ties = (Seq.fill(50)(1.0) ++ Seq.fill(50)(2.0)).toDF("v")
    val tb = Aggregates.histogramEquiDepth(ties, "v", 2)
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(tb.toSeq == Seq((0L, 50L), (1L, 50L)))
  }

  test("winsorizedStats: clipping tames a planted outlier") {
    import graft.operators.Aggregates
    val df = ((1 to 99).map(i => ("g", i.toDouble)) :+ ("g", 1e6))
      .toDF("k", "v")
    val r = Aggregates.winsorizedStats(df, Seq("k"), "v", 0.05, 0.95)
      .collect().head
    val mean = r.getAs[Double]("wins_mean")
    assert(mean > 40 && mean < 60,
      s"winsorized mean should sit near 50, got $mean")
    assert(r.getAs[Double]("p_lo") < r.getAs[Double]("p_hi"))
    assert(r.getAs[Long]("n") == 100L)
  }

  test("benford: first significant digit extracted across magnitudes, non-positives excluded") {
    import graft.operators.Aggregates
    // digits span magnitudes: 1.0/12/150 -> 1, 25/2.9 -> 2, 0.05 -> 5;
    // zero and negatives must not participate at all
    val df = Seq(1.0, 12.0, 150.0, 25.0, 2.9, 0.05, 0.0, -5.0).toDF("v")
    val out = Aggregates.benford(df, "v").collect()
      .map(r => r.getAs[Int]("digit") ->
        (r.getAs[Long]("n"), r.getAs[Double]("observed"),
         r.getAs[Double]("expected"), r.getAs[Double]("abs_dev"))).toMap
    assert(out.keySet == Set(1, 2, 5))
    assert(out(1)._1 == 3L && out(2)._1 == 2L && out(5)._1 == 1L)
    assert(out(1)._2 == 0.5 && out(2)._2 == 0.333333)
    // expected shares are the Benford curve, deviations consistent
    assert(out(1)._3 == 0.30103 && out(5)._3 == 0.079181)
    assert(math.abs(out(1)._4 - (0.5 - 0.30103)) < 1e-6)
  }

  test("topShare: exact-percentile threshold, ties included on the top side") {
    import graft.operators.Aggregates
    val df = (1 to 10).map(_.toDouble).toDF("v")
    // percentile(1..10, 0.9) interpolates to 9.1 -> top = {10}
    val r = Aggregates.topShare(df, "v", 0.9).collect().head
    assert(r.getAs[Double]("threshold") == 9.1)
    assert(r.getAs[Double]("top_share") == 0.181818, r.toString)
    assert(r.getAs[Long]("n_top") == 1L && r.getAs[Long]("n") == 10L)
    // ties AT the threshold count as top: all-equal column -> share 1
    val ties = Seq.fill(8)(5.0).toDF("v")
    val rt = Aggregates.topShare(ties, "v", 0.5).collect().head
    assert(rt.getAs[Double]("top_share") == 1.0 &&
      rt.getAs[Long]("n_top") == 8L)
  }

  test("autocorrelation: alternating series scores -1 at lag 1 and +1 at lag 2") {
    import graft.operators.Aggregates
    // one event per day, values alternating 1/3 for 14 days
    val rows = (0 until 14).map(i =>
      ("k", java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"),
        if (i % 2 == 0) 1.0 else 3.0))
    val df = rows.toDF("k", "t", "v")
    val out = Aggregates.autocorrelation(df, Seq("k"), "t", "v", maxLag = 2)
      .collect().map(r => r.getAs[Int]("lag") ->
        (r.getAs[Double]("acf"), r.getAs[Long]("n_pairs"))).toMap
    assert(out(1) == (-1.0, 13L), out.toString)
    assert(out(2) == (1.0, 12L), out.toString)
  }

  test("pacf: Durbin-Levinson algebra; AR(1) cuts off after lag 1; degenerate acf yields null") {
    import graft.operators.Aggregates
    // AR(1) with phi=0.8 driven by a deterministic hash-noise term,
    // one point per day
    var y = 0.0
    val rnd = new scala.util.Random(7) // java.util.Random LCG: spec-fixed
    val rows = (0 until 120).map { i =>
      y = 0.8 * y + (rnd.nextDouble() - 0.5)
      ("k", new java.sql.Timestamp(1704103200000L + i * 86400000L), y)
    }
    val df = rows.toDF("k", "t", "v")
    val out = Aggregates.pacf(df, Seq("k"), "t", "v")
      .collect().map(r => r.getAs[Int]("lag") ->
        r.getAs[Double]("pacf")).toMap
    val acf = Aggregates.autocorrelation(df, Seq("k"), "t", "v", 3)
      .collect().map(r => r.getAs[Int]("lag") ->
        r.getAs[Double]("acf")).toMap
    // lag-1 PACF IS the lag-1 ACF
    assert(out(1) == acf(1), s"$out vs $acf")
    // Durbin-Levinson algebra reproduced from the same rounded r's
    val (r1, r2, r3) = (acf(1), acf(2), acf(3))
    val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val p21 = r1 - p22 * r1
    val p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
    assert(out(2) == math.rint(p22 * 1e6) / 1e6 ||
      math.abs(out(2) - p22) < 1e-5, s"${out(2)} vs $p22")
    assert(math.abs(out(3) - p33) < 1e-5, s"${out(3)} vs $p33")
    // AR(1): direct influence beyond lag 1 is ~0 while acf(2) stays
    // large (the whole point of PACF)
    assert(acf(2) > 0.3 && math.abs(out(2)) < 0.15, s"$acf $out")
    assert(math.abs(out(3)) < 0.15)
    // alternating series: acf(1) = -1 -> 1 - r1^2 = 0 -> lag 2/3 null
    val alt = (0 until 14).map(i =>
      ("k", java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"),
        if (i % 2 == 0) 1.0 else 3.0)).toDF("k", "t", "v")
    val deg = Aggregates.pacf(alt, Seq("k"), "t", "v")
      .collect().map(r => r.getAs[Int]("lag") ->
        Option(r.get(r.fieldIndex("pacf")))).toMap
    assert(deg(1).contains(-1.0) && deg(2).isEmpty && deg(3).isEmpty,
      deg.toString)
  }

  test("mutualInfo: identical columns give MI = H and NMI = 1; independent give 0") {
    import graft.operators.Aggregates
    val dep = (Seq.fill(10)("a") ++ Seq.fill(10)("b")).map(x => (x, x)).toDF("x", "y")
    val rd = Aggregates.mutualInfo(dep, "x", "y").collect().head
    assert(math.abs(rd.getAs[Double]("mi_nats") - math.log(2)) < 1e-6)
    assert(rd.getAs[Double]("h_x") == rd.getAs[Double]("h_y"))
    assert(rd.getAs[Double]("nmi") == 1.0 && rd.getAs[Long]("n") == 20L)
    // full cross product with equal counts -> exactly independent
    val ind = (for (x <- Seq("a", "b"); y <- Seq("c", "d"); _ <- 1 to 5)
      yield (x, y)).toDF("x", "y")
    val ri = Aggregates.mutualInfo(ind, "x", "y").collect().head
    assert(math.abs(ri.getAs[Double]("mi_nats")) < 1e-9, ri.toString)
  }

  test("zipfSlope: exact power law recovers its exponent with r2 = 1") {
    import graft.operators.Aggregates
    // c = 1000 / r^2 over ranks 1..8 -> slope -2, intercept ln 1000
    val freq = (1 to 8).map(r => (s"w$r", 1000.0 / (r * r))).toDF("w", "c")
    val out = Aggregates.zipfSlope(freq, "w", "c", topN = 100)
      .collect().head
    assert(out.getAs[Double]("slope") == -2.0, out.toString)
    assert(math.abs(out.getAs[Double]("intercept") - math.log(1000)) < 1e-5)
    assert(out.getAs[Double]("r2") == 1.0 && out.getAs[Long]("n_terms") == 8L)
    // topN truncates the fit set and ranks tie-break on the term
    val out3 = Aggregates.zipfSlope(freq, "w", "c", topN = 3).collect().head
    assert(out3.getAs[Long]("n_terms") == 3L)
  }

  test("paretoClasses: known 80/15/5 split classifies A/B/C, bucket-invariant") {
    import graft.operators.Aggregates
    val df = Seq(("k1", 80.0), ("k2", 15.0), ("k3", 5.0)).toDF("k", "v")
    val out = Aggregates.paretoClasses(df, "k", "v").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_keys"), r.getAs[Double]("revenue"),
          r.getAs[Double]("revenue_share"))).toMap
    assert(out("A") == (1L, 80.0, 0.8))
    assert(out("B") == (1L, 15.0, 0.15))
    assert(out("C") == (1L, 5.0, 0.05))
    // decomposition must not depend on the bucket count
    val many = (1 to 200).map(i => (s"k$i", (201 - i).toDouble)).toDF("k", "v")
    val b1 = Aggregates.paretoClasses(many, "k", "v", buckets = 1)
      .orderBy("pareto_class").collect().toSeq
    val b9 = Aggregates.paretoClasses(many, "k", "v", buckets = 9)
      .orderBy("pareto_class").collect().toSeq
    assert(b1 == b9, s"$b1 vs $b9")
  }

  test("periodOverPeriod: MoM and YoY growth against a planted 13-month series") {
    import graft.operators.Aggregates
    // month i carries revenue 100 * 2^i -> mom = 1.0 everywhere,
    // yoy at month 13 = 2^12 - 1
    val rows = (0 until 13).map { i =>
      val m = i % 12 + 1
      val y = 2023 + i / 12
      (java.sql.Timestamp.valueOf(f"$y-$m%02d-15 00:00:00"),
        100.0 * (1L << i))
    }
    val out = Aggregates.periodOverPeriod(rows.toDF("t", "v"), "t", "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("revenue"), Option(r.get(2)), Option(r.get(3))))
      .toMap
    assert(out("2023-01") == (100.0, None, None))
    assert(out("2023-02")._2.contains(1.0))
    assert(out("2024-01")._3.contains(4095.0))
    assert(out.size == 13)
  }

  test("cusumChangePoint: planted mean shift is found at the shift boundary") {
    import graft.operators.Aggregates
    // 10 days at 0 then 10 days at 10: |S| peaks (=50) on day 10
    val rows = (0 until 20).map(i =>
      ("k", java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 09:00:00"),
        if (i < 10) 0.0 else 10.0))
    val r = Aggregates.cusumChangePoint(rows.toDF("k", "t", "v"),
      Seq("k"), "t", "v").collect().head
    assert(r.getAs[java.sql.Date]("change_day").toString == "2024-01-10")
    assert(r.getAs[Double]("cusum_peak") == 50.0)
    assert(r.getAs[Long]("n_days") == 20L)
  }

  test("diffTables: add/remove/change classification is null-safe per column") {
    import graft.etl.Cdc
    val old = Seq(
      (1L, Some(10.0), "a"), // unchanged
      (2L, Some(20.0), "b"), // price changes
      (3L, None: Option[Double], "c"), // null -> value = changed
      (4L, Some(40.0), "d")) // removed
      .toDF("k", "price", "st")
    val nw = Seq(
      (1L, Some(10.0), "a"),
      (2L, Some(25.0), "b"),
      (3L, Some(3.0), "c"),
      (5L, Some(50.0), "e")) // added
      .toDF("k", "price", "st")
    val out = Cdc.diffTables(old, nw, Seq("k"), Seq("price", "st"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("changed_price"),
          r.getAs[Long]("changed_st"))).toMap
    assert(out("unchanged") == (1L, 0L, 0L))
    assert(out("changed") == (2L, 2L, 0L))
    assert(out("removed") == (1L, 0L, 0L))
    assert(out("added") == (1L, 0L, 0L))
  }

  test("qqDrift: pure location shift moves every decile by the same amount") {
    import graft.operators.Aggregates
    val a = (1 to 100).map(_.toDouble).toDF("v")
    val b = (1 to 100).map(_ + 10.0).toDF("v")
    val out = Aggregates.qqDrift(a, b, "v").collect()
      .map(r => r.getAs[Double]("p") ->
        (r.getAs[Double]("q_a"), r.getAs[Double]("shift"))).toMap
    assert(out.size == 9)
    // percentile(1..100, 0.1) interpolates to 1 + 0.1*99 = 10.9
    assert(out(0.1)._1 == 10.9)
    assert(out(0.5)._1 == 50.5)
    assert(out.values.forall(_._2 == 10.0), out.toString)
  }

  test("scd2: partition-independent") {
    val df = spark.range(5000).select(
      (col("id") % 61).as("k"), col("id").as("t"),
      (col("id") * 2654435761L % 4).cast("string").as("st"))
    val a = graft.etl.Cdc.scd2(df, "k", "t", Seq("st"))
      .orderBy("k", "valid_from").collect()
    val b = graft.etl.Cdc.scd2(df.repartition(17), "k", "t", Seq("st"))
      .orderBy("k", "valid_from").collect()
    assert(a.sameElements(b))
    // intervals tile each key's timeline: non-current rows' valid_to
    // equals the next row's valid_from (already implied by the lead
    // construction) and exactly one current row per key
    val cur = graft.etl.Cdc.scd2(df, "k", "t", Seq("st"))
      .groupBy("k").agg(sum(when(col("is_current"), 1).otherwise(0)).as("n"))
      .collect().map(_.getLong(1))
    assert(cur.forall(_ == 1L))
  }

  test("auc: hand-computed midrank value with ties; separation endpoints") {
    import graft.operators.Aggregates
    // scores: pos {0.9, 0.7, 0.5}, neg {0.7, 0.3}
    // pairs: (0.9 beats both)=2, (0.7 vs 0.7 tie=0.5, beats 0.3)=1.5,
    // (0.5 loses 0.7, beats 0.3)=1 -> AUC = 4.5/6 = 0.75
    val df = Seq((0.9, true), (0.7, true), (0.5, true),
      (0.7, false), (0.3, false)).toDF("s", "y")
    val r = Aggregates.auc(df, col("y"), col("s")).collect().head
    assert(r.getDouble(0) == 0.75 &&
      r.getLong(1) == 3L && r.getLong(2) == 2L)
    // perfect separation -> 1.0; inverted scores -> symmetric 0.25
    val perf = Seq((5.0, true), (4.0, true), (1.0, false))
      .toDF("s", "y")
    assert(Aggregates.auc(perf, col("y"), col("s"))
      .collect().head.getDouble(0) == 1.0)
    val inv = Aggregates.auc(df, col("y"), -col("s")).collect().head
    assert(inv.getDouble(0) == 1.0 - 0.75)
    // one-class input degrades to null, not a division error
    val one = Seq((1.0, true), (2.0, true)).toDF("s", "y")
    assert(Aggregates.auc(one, col("y"), col("s")).collect().head.isNullAt(0))
  }

  test("prCurve: hand-computed confusion quadrant at the median threshold") {
    import graft.operators.Aggregates
    val df = Seq((0.9, true), (0.7, true), (0.5, true),
      (0.7, false), (0.3, false)).toDF("s", "y")
    // median over the 5 raw rows is 0.7 — exercises the frequency-
    // weighted percentile over the collapsed distinct frame
    val r = Aggregates.prCurve(df, col("y"), col("s"), Seq(0.5))
      .collect().head
    assert(r.getAs[Double]("threshold") == 0.7)
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("fp") == 1L &&
      r.getAs[Long]("fn") == 1L && r.getAs[Long]("tn") == 1L)
    assert(r.getAs[Double]("prec") == 0.666667 &&
      r.getAs[Double]("recall") == 0.666667 &&
      r.getAs[Double]("f1") == 0.666667)
    // counts tile the corpus at every threshold
    val all = Aggregates.prCurve(df, col("y"), col("s")).collect()
    assert(all.length == 9 && all.forall(x =>
      x.getAs[Long]("tp") + x.getAs[Long]("fp") +
        x.getAs[Long]("fn") + x.getAs[Long]("tn") == 5L))
  }

  test("seasonalDecompose: a pure weekly signal lands in seasonal, not remainder") {
    import graft.operators.Aggregates
    import java.sql.Timestamp
    val s = Seq(7.0, -7.0, 3.0, -3.0, 5.0, -5.0, 0.0) // sums to 0
    val df = (0 until 28).map { i =>
      (Timestamp.valueOf(f"2024-02-${i + 1}%02d 10:00:00"),
        100.0 + s(i % 7))
    }.toDF("t", "v")
    val out = Aggregates.seasonalDecompose(df, col("t"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // interior days: the centered 7-day MA is exactly the base level,
    // the weekly pattern lands fully in seasonal, remainder ~ 0
    (4 to 25).foreach { d =>
      val (trend, seas, rem) = out(f"2024-02-$d%02d")
      assert(trend == 100.0, s"day $d trend $trend")
      assert(math.abs(seas - s((d - 1) % 7)) < 1.0, s"day $d seas $seas")
      assert(math.abs(rem) < 1.0, s"day $d rem $rem")
    }
    // decomposition is exact by construction: y = trend+seasonal+rem
    val rows = Aggregates.seasonalDecompose(df, col("t"), col("v"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) -
        (r.getDouble(2) + r.getDouble(3) + r.getDouble(4))) < 1e-5)
    }
  }

  test("cuped: a perfectly predictive covariate leaves only the arm effect") {
    import graft.operators.Aggregates
    // y = 3x + arm, with x chosen orthogonal to arm: theta must
    // recover 3, adjustment strips all covariate variance, and the
    // CUPED diff equals the true effect 1.0
    val units = Seq((1.0, 0), (2.0, 1), (3.0, 1), (4.0, 0))
      .map { case (x, a) => (a, x, 3.0 * x + a) }
      .toDF("arm", "x", "y")
    val r = Aggregates.cuped(units, col("arm"), col("x"), col("y"))
      .collect().head
    assert(r.getAs[Long]("n_units") == 4L)
    assert(math.abs(r.getAs[Double]("theta") - 3.0) < 1e-9)
    assert(r.getAs[Double]("var_adj") == 0.25) // var of the arm bits
    assert(math.abs(r.getAs[Double]("diff_cuped") - 1.0) < 1e-9)
    // var(y) = 9*var(x) + var(arm) = 9*1.25 + 0.25 = 11.5
    assert(r.getAs[Double]("var_y") == 11.5)
    // degenerate covariate: theta null, metric passes through
    val flat = Seq((0, 1.0, 5.0), (1, 1.0, 7.0)).toDF("arm", "x", "y")
    val fr = Aggregates.cuped(flat, col("arm"), col("x"), col("y"))
      .collect().head
    assert(fr.isNullAt(fr.fieldIndex("theta")))
    assert(fr.getAs[Double]("diff_cuped") == 2.0)
    // zero-variance metric: var_reduction is null, not a
    // DIVIDE_BY_ZERO crash under ANSI
    val samey = Seq((0, 1.0, 5.0), (1, 2.0, 5.0)).toDF("arm", "x", "y")
    val sr = Aggregates.cuped(samey, col("arm"), col("x"), col("y"))
      .collect().head
    assert(sr.isNullAt(sr.fieldIndex("var_reduction")))
  }

  test("frequentTriples: downward-closure prune, fractional threshold, exact support") {
    import graft.operators.Aggregates
    val bi = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (2L, "C"), (2L, "C"), // dup collapses
      (3L, "A"), (3L, "B"), (3L, "D"),
      (4L, "E")).toDF("b", "i")
    // thr = ceil(4 * 0.5) = 2: D and E are infrequent and must be
    // pruned before expansion; only (A,B,C) reaches support 2
    val out = Aggregates.frequentTriples(bi, "b", "i", 0.5)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSeq
    assert(out == Seq(("A", "B", "C", 2L)), out)
    // the A-priori item prune is in the plan: a LeftSemi against the
    // frequent-item frame gates the triple expansion
    val plan = Aggregates.frequentTriples(bi, "b", "i", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
  }

  test("calibrationBins: a perfectly calibrated score reports its own rate") {
    import graft.operators.Aggregates
    // score == true probability: rows with score s are positive at
    // rate s (built deterministically: i%10 < s*10)
    val df = (0 until 1000).map { i =>
      val s = (i % 10) / 10.0 + 0.05
      (s, (i / 10) % 10 < (i % 10) + 1)
    }.toDF("s", "y")
    val out = Aggregates.calibrationBins(df, col("y"), col("s"), bins = 5)
      .orderBy("bin").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.map(_.getLong(1)).sum == 1000L)
    // observed rate tracks mean score inside each equi-depth bin
    out.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 0.06,
        s"bin ${r.getLong(0)}: ${r.getDouble(2)} vs ${r.getDouble(3)}")
    }
  }

  test("diffInDiff: hand-computed 2x2 cells; trend and baseline both netted out") {
    import graft.operators.Aggregates
    // T pre {1,3}->2, T post {5,7}->6, C pre {2}->2, C post {3}->3
    // DiD = (6-2) - (3-2) = 3
    val df = Seq(
      (1.0, true, false), (3.0, true, false),
      (5.0, true, true), (7.0, true, true),
      (2.0, false, false), (3.0, false, true))
      .toDF("y", "t", "post")
    val r = Aggregates.diffInDiff(df, col("y"), col("t"), col("post"))
      .collect().head
    assert(r.getAs[Long]("n_treated_pre") == 2L &&
      r.getAs[Long]("n_control_post") == 1L)
    assert(r.getAs[Double]("treated_post") == 6.0 &&
      r.getAs[Double]("control_pre") == 2.0)
    assert(r.getAs[Double]("did") == 3.0, r.toString)
    // pure common trend (both groups +2, same baseline) -> DiD 0
    val flat = Seq(
      (1.0, true, false), (3.0, true, true),
      (1.0, false, false), (3.0, false, true))
      .toDF("y", "t", "post")
    assert(Aggregates.diffInDiff(flat, col("y"), col("t"), col("post"))
      .collect().head.getAs[Double]("did") == 0.0)
  }

  test("auc is bucketing-invariant") {
    import graft.operators.Aggregates
    val df = (1 to 200).map(i =>
      (math.sin(i * 1.7) * 10, i % 3 == 0)).toDF("s", "y")
    val b1 = Aggregates.auc(df, col("y"), col("s"), buckets = 1)
      .collect().head.getDouble(0)
    val b7 = Aggregates.auc(df, col("y"), col("s"), buckets = 7)
      .collect().head.getDouble(0)
    val bk = Aggregates.auc(df, col("y"), col("s")).collect().head.getDouble(0)
    assert(b1 == b7 && b7 == bk)
  }
}
