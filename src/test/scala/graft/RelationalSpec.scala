package graft

import graft.operators.{Aggregates, Relational}
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("dedupKeyed keeps the minimum row per key by the given order") {
    val df = Seq((1, 10, "b"), (1, 5, "a"), (2, 7, "c")).toDF("k", "v", "tag")
    val out = Relational.dedupKeyed(Seq("k"), Seq(col("v")))(df)
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((1, 5, "a"), (2, 7, "c")))
  }

  test("dedupExact is a distinct over the projection") {
    val df = Seq((1, "a"), (1, "a"), (1, "b")).toDF("k", "t")
    assert(Relational.dedupExact(Seq("k", "t"))(df).count() == 2)
  }

  test("nullProfile counts nulls per column in one row") {
    val df = Seq((Some(1), Option.empty[String]), (None, Some("x")),
      (Some(3), Some("y"))).toDF("a", "b")
    val r = Relational.nullProfile(df).collect().head
    assert(r.getLong(0) == 1 && r.getLong(1) == 1)
  }

  test("repairSentinel replaces only sentinel rows") {
    val df = Seq((-1.0, 2.0, 4.0), (10.0, 2.0, 4.0)).toDF("price", "bid", "ask")
    val out = Relational.repairSentinel("price", col("price") === -1.0,
      (col("bid") + col("ask")) / 2)(df)
      .select("price").as[Double].collect().sorted
    assert(out.toSeq == Seq(3.0, 10.0))
  }

  test("interpolateLinear fills interior gaps linearly, leaves edges null") {
    val df = Seq(
      ("s", 0L, Some(10.0)), ("s", 1L, None), ("s", 2L, None),
      ("s", 3L, Some(40.0)), ("s", 4L, None),
      ("t", 0L, None), ("t", 1L, Some(5.0)))
      .toDF("sym", "x", "v")
    val out = Relational.interpolateLinear(Seq("sym"), "x", "v")(df)
      .orderBy("sym", "x").select("v").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(10.0), Some(20.0), Some(30.0), Some(40.0),
      None, None, Some(5.0)))
  }

  test("gridFill produces the full dim cross product with defaults") {
    val dimA = Seq("d1", "d2").toDF("day")
    val dimB = Seq("x", "y").toDF("kind")
    val agg = Seq(("d1", "x", 5L)).toDF("day", "kind", "n")
    val out = Relational.gridFill(dimA, dimB, agg, Seq("day", "kind"),
      Map("n" -> lit(0L)))
    assert(out.count() == 4)
    assert(out.agg(sum("n")).as[Long].collect().head == 5L)
  }

  test("fullOuterCoalesce keeps unmatched keys from both sides") {
    val a = Seq(("d1", 1.0), ("d2", 2.0)).toDF("day", "x")
    val b = Seq(("d2", 20.0), ("d3", 30.0)).toDF("day", "y")
    val out = Relational.fullOuterCoalesce(a, b, Seq("day"),
      Map("m" -> ("x", "y"))).orderBy("day")
      .select("m").as[Double].collect()
    assert(out.toSeq == Seq(1.0, 2.0, 30.0))
  }

  test("topK is deterministic under ties via tie-break columns") {
    val df = Seq(("a", 5L), ("b", 5L), ("c", 5L)).toDF("k", "n")
    val out = Relational.topK(2, Seq(col("n").desc), Seq(col("k")))(df)
      .select("k").as[String].collect()
    assert(out.toSeq == Seq("a", "b"))
  }

  test("statsProfile emits min/max/avg/std per metric") {
    val df = Seq(("g", 1.0), ("g", 3.0)).toDF("k", "m")
    val r = Aggregates.statsProfile(Seq("k"), Seq("m"), 2)(df).collect().head
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 3.0 &&
      r.getDouble(3) == 2.0 && r.getDouble(4) == 1.41)
  }

  test("spearmanMinRank is 1.0 for a monotone relation") {
    val df = (1 to 20).map(i => (i.toDouble, (i * i).toDouble)).toDF("x", "y")
    val r = Aggregates.spearmanMinRank("x", "y")(df).as[Double].collect().head
    assert(r == 1.0)
  }

  test("corrMatrix emits symmetric tidy pairs with unit diagonal") {
    val df = (1 to 50).map(i =>
      (i.toDouble, i * 2.0, 50.0 - i)).toDF("x", "y", "z")
    val m = Aggregates.corrMatrix(Seq("x", "y", "z"))(df)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    assert(m(("x", "x")) == 1.0 && m(("y", "y")) == 1.0)
    assert(m(("x", "y")) == 1.0)   // perfectly correlated
    assert(m(("x", "z")) == -1.0)  // perfectly anti-correlated
    assert(m(("x", "y")) == m(("y", "x")))
    val sp = Aggregates.corrMatrix(Seq("x", "y"), "spearman")(df)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    assert(sp(("x", "y")) == 1.0)
  }

  test("spearmanDistributed agrees with min-rank variant on tie-free data") {
    val df = Seq((1.0, 10.0), (2.0, 30.0), (3.0, 20.0), (4.0, 40.0),
      (5.0, 35.0)).toDF("x", "y")
    val minRank = Aggregates.spearmanMinRank("x", "y")(df)
      .as[Double].collect().head
    val dist = Aggregates.spearmanDistributed("x", "y")(df)
    assert(math.abs(minRank - dist) < 1e-9)
  }

  test("percentiles: sketch twin tracks the exact form within rank error") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val ps = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.95 -> "p95")
    def byFlag(exact: Boolean) =
      Aggregates.percentiles(Seq("l_returnflag"), "l_extendedprice", ps,
        exact = exact)(li)
        .collect().map(r => r.getString(0) ->
          (1 to 4).map(r.getDouble)).toMap
    val e = byFlag(true); val a = byFlag(false)
    assert(e.keySet == a.keySet)
    for (k <- e.keySet; i <- 0 until 4) {
      val (ev, av) = (e(k)(i), a(k)(i))
      assert(math.abs(ev - av) / math.max(ev.abs, 1.0) < 0.01,
        s"flag $k p${ps(i)._2}: exact $ev vs approx $av")
    }
  }

  test("size-gated spearman: both gate paths agree to 6dp, tie-free") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 200).map(_ =>
      (rnd.nextDouble(), rnd.nextDouble())).toDF("x", "y")
    val small = Aggregates.spearman("x", "y")(df)
      .as[Double].collect().head                    // min-rank path
    val large = Aggregates.spearman("x", "y", maxExactRows = 10)(df)
      .as[Double].collect().head                    // distributed path
    assert((small - large).abs < 1e-6, s"$small vs $large")
    assert(small == Aggregates.spearmanMinRank("x", "y")(df)
      .as[Double].collect().head)
  }

  test("rmse matches a hand computation") {
    val df = Seq((1.0, 2.0), (3.0, 5.0)).toDF("p", "l")
    val r = Aggregates.rmse(Nil, "p", "l", 4)(df).as[Double].collect().head
    // sqrt((1 + 4)/2) = 1.5811
    assert(r == 1.5811)
  }

  test("rollingZscore matches hand-computed trailing-window values") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("a", 4L, 10.0)).toDF("k", "t", "v")
    val out = Aggregates.rollingZscore(Seq("k"), Seq(col("t")), "v", 3)(df)
      .orderBy("t").select("zscore").collect()
    assert(out(0).isNullAt(0)) // single row: sample stddev undefined
    assert(math.abs(out(1).getDouble(0) - 0.7071) < 1e-9) // (2-1.5)/0.70710678
    assert(math.abs(out(2).getDouble(0) - 1.0) < 1e-9)    // (3-2)/1
    // (10-5)/sqrt(19) over window {2,3,10}
    assert(math.abs(out(3).getDouble(0) -
      BigDecimal(5.0 / math.sqrt(19.0)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("deterministicSample is key-stable and layout-independent") {
    val df = (1L to 500L).flatMap(u => Seq((u, "a"), (u, "b"))).toDF("u", "tag")
    val s1 = Relational.deterministicSample(df, col("u"), 0.3)
    val keptUsers = s1.select("u").distinct().as[Long].collect().toSet
    // key-stable: both rows of every kept user survive together
    assert(s1.count() == keptUsers.size * 2L)
    // same selection under a different physical layout
    val s2 = Relational.deterministicSample(df.repartition(13), col("u"), 0.3)
    assert(s2.select("u").distinct().as[Long].collect().toSet == keptUsers)
    // ~30% of 500 users, generous band
    assert(keptUsers.size > 100 && keptUsers.size < 200, keptUsers.size)
  }

  test("stratifiedTake: exact k per stratum, short strata whole, stable") {
    val df = ((1L to 100L).map(i => (i, "big")) ++
      (200L to 203L).map(i => (i, "small"))).toDF("id", "s")
    val t1 = Relational.stratifiedTake(df, col("s"), col("id"), 10)
      .as[(Long, String)].collect()
    val byS = t1.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byS("big").size == 10)
    assert(byS("small") == Set(200L, 201L, 202L, 203L)) // < k: kept whole
    // layout-independent: same selection after a repartition
    val t2 = Relational.stratifiedTake(df.repartition(7), col("s"),
      col("id"), 10).as[(Long, String)].collect()
    assert(t2.toSet == t1.toSet)
    // nested: the k=5 take is a subset of the k=10 take per stratum
    val t3 = Relational.stratifiedTake(df, col("s"), col("id"), 5)
      .as[(Long, String)].collect().toSet
    assert(t3.subsetOf(t1.toSet))
  }

  test("rollupAgg emits every prefix level plus the grand total, tagged") {
    val df = Seq(("F", "1995", 10.0), ("F", "1996", 20.0), ("O", "1995", 5.0))
      .toDF("status", "yr", "price")
    val out = Aggregates.rollupAgg(Seq("status", "yr"),
      Seq(round(sum(col("price")), 2).as("rev")))(df)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set(
      ("F", "1995", 0L, 10.0), ("F", "1996", 0L, 20.0), ("O", "1995", 0L, 5.0),
      ("F", null, 1L, 30.0), ("O", null, 1L, 5.0),
      (null, null, 3L, 35.0)))
  }

  test("cubeAgg emits all 2^n grouping sets") {
    val df = Seq(("a", "x", 1L), ("a", "y", 1L), ("b", "x", 1L))
      .toDF("k1", "k2", "v")
    val out = Aggregates.cubeAgg(Seq("k1", "k2"),
      Seq(count(lit(1)).as("n")))(df)
    // 3 exact + 2 k1-subtotals + 2 k2-subtotals + 1 grand total
    assert(out.count() == 8)
    val grand = out.filter(col("lvl") === 3).select("n").as[Long].collect()
    assert(grand.toSeq == Seq(3L))
  }

  test("pivotAgg widens one column per pivot value") {
    val df = Seq(("d1", "click", 1.0), ("d1", "view", 3.0), ("d2", "click", 5.0))
      .toDF("day", "tp", "v")
    val out = Aggregates.pivotAgg(Seq("day"), "tp", Seq("click", "view"),
      round(avg(col("v")), 2))(df)
    assert(out.columns.toSeq == Seq("day", "click", "view"))
    val d2 = out.filter(col("day") === "d2").collect().head
    assert(d2.getDouble(1) == 5.0 && d2.isNullAt(2))
  }

  test("intersect/except operate by name, with distinct semantics") {
    val a = Seq((1, "x"), (2, "y"), (2, "y"), (3, "z")).toDF("k", "t")
    // same columns, swapped order: by-name alignment must fix it
    val b = Seq(("y", 2), ("z", 3), ("w", 4)).toDF("t", "k")
    val inter = Relational.intersectDistinct(a, b)
      .as[(Int, String)].collect().sorted
    assert(inter.toSeq == Seq((2, "y"), (3, "z")))
    val exc = Relational.exceptDistinct(a, b)
      .as[(Int, String)].collect().sorted
    assert(exc.toSeq == Seq((1, "x")))
  }

  test("stratifiedSample applies per-stratum rates, key-stable") {
    val df = (1L to 1000L).map(i => (i, if (i <= 500) "big" else "rare"))
      .toDF("id", "stratum")
    val out = Relational.stratifiedSample(df, col("stratum"), col("id"),
      Map("big" -> 0.2), defaultRate = 1.0)
    val byStratum = out.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    // rare stratum kept whole; big stratum ~20% (generous band)
    assert(byStratum("rare") == 500L)
    assert(byStratum("big") > 50L && byStratum("big") < 200L, byStratum)
    // key-stable: identical selection under a different layout
    val again = Relational.stratifiedSample(df.repartition(13),
      col("stratum"), col("id"), Map("big" -> 0.2))
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("withHashSplit is deterministic, in-range, and partition-independent") {
    val df = (1L to 2000L).toDF("id")
    val a = Relational.withHashSplit(df, col("id"), 10)
      .select("id", "split_bucket").as[(Long, Long)].collect().toMap
    assert(a.values.forall(b => b >= 0 && b < 10))
    // same keys, different physical layout -> identical assignment
    val b = Relational.withHashSplit(df.repartition(7), col("id"), 10)
      .select("id", "split_bucket").as[(Long, Long)].collect().toMap
    assert(a == b)
    // roughly uniform: each bucket within 3x of the expected 200
    val sizes = a.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size == 10 && sizes.values.forall(s => s > 66 && s < 600))
  }

  test("deterministicTake: exact k, partition-independent, TakeOrdered plan") {
    val df = spark.range(0, 1000).toDF("id")
    val a = Relational.deterministicTake(df, col("id"), 50)
    assert(a.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"), "must plan as bounded top-k")
    val idsA = a.select("id").as[Long].collect().toSet
    val idsB = Relational
      .deterministicTake(df.repartition(13), col("id"), 50)
      .select("id").as[Long].collect().toSet
    assert(idsA.size == 50 && idsA == idsB)
    // different salt picks a (deterministically) different subset
    val idsC = Relational.deterministicTake(df, col("id"), 50, salt = "v2")
      .select("id").as[Long].collect().toSet
    assert(idsC.size == 50 && idsC != idsA)
  }

  test("profileColumns: per-column nulls/distincts in one pass; approx tracks exact") {
    val df = Seq((1, Option("a")), (2, Option("b")), (3, None), (4, Option("a")))
      .toDF("id", "s")
    val p = Relational.profileColumns(df, Seq("id", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(p("id") == (0L, 4L))
    assert(p("s") == (1L, 2L), "distinct must skip nulls")
    val a = Relational.profileColumns(df, Seq("id", "s"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(math.abs(a("id") - 4L) <= 1 && math.abs(a("s") - 2L) <= 1)
  }

  test("weightedTake: exact k, partition-independent, weight-dominant") {
    val df = spark.range(1000).toDF("id")
      .withColumn("w", when(col("id") < 500, 10.0).otherwise(1.0))
    val a = Relational.weightedTake(df, col("id"), col("w"), 200)
      .select("id").as[Long].collect().toSet
    assert(a.size == 200)
    // layout-independent
    val b = Relational.weightedTake(df.repartition(13), col("id"),
      col("w"), 200).select("id").as[Long].collect().toSet
    assert(a == b)
    // 10x-weighted half must dominate the sample (expected ~185 of
    // 200 under Efraimidis-Spirakis; 140 is many sigma of slack)
    assert(a.count(_ < 500) > 140, s"heavy half got ${a.count(_ < 500)}")
    // an overwhelming weight is effectively always selected
    val huge = df.withColumn("w",
      when(col("id") === 999, 1e9).otherwise(col("w")))
    val c = Relational.weightedTake(huge, col("id"), col("w"), 10)
      .select("id").as[Long].collect().toSet
    assert(c.contains(999L))
    // TakeOrdered plan — no global sort materialization
    val plan = Relational.weightedTake(df, col("id"), col("w"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
