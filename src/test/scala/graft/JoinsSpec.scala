package graft

import graft.operators.Joins
import java.sql.Timestamp

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asOfJoin picks the latest right row at-or-before each left row") {
    val left = Seq(
      ("a", ts(5), 1L), ("a", ts(15), 2L), ("a", ts(30), 3L),
      ("b", ts(10), 4L), ("c", ts(10), 5L))
      .toDF("k", "t", "lid")
    val right = Seq(
      ("a", ts(5), "r1"),   // exactly at left t=5 -> matches (<=)
      ("a", ts(10), "r2"),
      ("a", ts(20), "r3"),
      ("b", ts(50), "r4"))  // after b's only left row -> b unmatched
      .toDF("k", "rt", "tag")
    val out = Joins.asOfJoin(left, right, Seq("k"), "t", "rt")
      .orderBy("lid").select("lid", "tag").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "r1"), (2L, "r2"), (3L, "r3")))
  }

  test("asOfJoin keeps all left columns and attaches right value columns") {
    val left = Seq(("a", ts(10), 7.5)).toDF("k", "t", "lval")
    val right = Seq(("a", ts(1), 42L, "x")).toDF("k", "rt", "rv1", "rv2")
    val out = Joins.asOfJoin(left, right, Seq("k"), "t", "rt").collect().head
    assert(out.getAs[Double]("lval") == 7.5)
    assert(out.getAs[Long]("rv1") == 42L)
    assert(out.getAs[String]("rv2") == "x")
  }

  test("asOfJoin attaches the whole matched right row, nulls included") {
    // the most recent right row has a NULL value column — the output
    // must take that null, not reach back to an older row's value
    val left = Seq(("a", ts(30), 1L)).toDF("k", "t", "lid")
    val right = Seq(
      ("a", ts(10), Some(100L), "old"),
      ("a", ts(20), None: Option[Long], "new"))
      .toDF("k", "rt", "rv1", "rv2")
    val out = Joins.asOfJoin(left, right, Seq("k"), "t", "rt").collect().head
    assert(out.isNullAt(out.fieldIndex("rv1")))
    assert(out.getAs[String]("rv2") == "new")
  }

  test("asOfJoin: empty right side and all-late right side yield no rows") {
    val left = Seq(("a", ts(5), 1L)).toDF("k", "t", "lid")
    val emptyRight = Seq.empty[(String, java.sql.Timestamp, String)]
      .toDF("k", "rt", "tag")
    assert(Joins.asOfJoin(left, emptyRight, Seq("k"), "t", "rt").count() == 0)
    val lateRight = Seq(("a", ts(99), "r")).toDF("k", "rt", "tag")
    assert(Joins.asOfJoin(left, lateRight, Seq("k"), "t", "rt").count() == 0)
  }

  test("rangeJoin pairs points with containing intervals") {
    val pts = Seq(("a", 5), ("a", 15), ("b", 5)).toDF("k", "p")
    val ivs = Seq(("a", 0, 10, "lo"), ("a", 10, 20, "hi"))
      .toDF("k", "lo", "hi", "label")
    val out = Joins.rangeJoin(pts, ivs, Seq("k"), "p", "lo", "hi")
      .select("p", "label").as[(Int, String)].collect().toSet
    assert(out == Set((5, "lo"), (15, "hi")))
  }

  test("rangeJoin: grid matches the naive form exactly on a hot key") {
    // ONE key owning every row — the worst case for the plain
    // key-equi-join (all fan-out lands on a single reducer). The grid
    // must (a) agree with the naive cross+filter ground truth
    // row-for-row, including intervals that straddle cell boundaries
    // matching each point exactly once, and (b) actually join on the
    // cell so per-task input is bounded by (key, cell) occupancy.
    val pts = (0 until 200).map(i => ("hot", i * 7 % 500)).toDF("k", "p")
    val ivs = (0 until 60).map { i =>
      ("hot", i * 8, i * 8 + 37, i.toLong) }.toDF("k", "lo", "hi", "iid")
    val grid = Joins.rangeJoin(pts, ivs, Seq("k"), "p", "lo", "hi",
      gridSeconds = 50.0)
    val naive = pts.join(ivs, "k")
      .filter($"p" >= $"lo" && $"p" < $"hi").select("p", "iid")
    val g = grid.select("p", "iid").as[(Int, Long)].collect()
    val n = naive.as[(Int, Long)].collect()
    assert(g.sorted.toSeq == n.sorted.toSeq)
    assert(g.length == g.distinct.length, "straddlers must not duplicate")
    // the physical join key must include the grid cell, not just k
    val plan = grid.queryExecution.executedPlan.toString
    assert(plan.contains("__cell"), s"expected grid cell in join keys:\n$plan")
  }

  test("rangeJoin with no keys is a cell join, not a cross join") {
    val pts = Seq(Tuple1(5), Tuple1(15), Tuple1(9999)).toDF("p")
    val ivs = Seq((0, 10, "a"), (10, 20, "b")).toDF("lo", "hi", "label")
    val out = Joins.rangeJoin(pts, ivs, Seq.empty, "p", "lo", "hi",
      gridSeconds = 10.0)
    // the BULK path must be the cell equi-join; the only nested-loop
    // node allowed is the rare-long-interval fallback branch, which is
    // gated on __ncells and broadcast (and empty here)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"keyless grid join must not plan a cartesian product:\n$plan")
    assert(plan.contains("__cell"),
      s"bulk path must equi-join on the grid cell:\n$plan")
    assert(out.select("p", "label").as[(Int, String)].collect().toSet ==
      Set((5, "a"), (15, "b")))
  }

  test("rangeJoin: sentinel open-ended intervals take the fallback, not " +
      "a billions-long sequence") {
    // an SCD-style 'valid forever' row: hi = year 9999. The grid form
    // would need ~7e7 hourly cells for this ONE row; the fallback must
    // route it around the explode and still match exactly.
    val pts = Seq(("u", ts(100)), ("u", ts(7300)), ("v", ts(500)))
      .toDF("k", "p")
    val far = java.sql.Timestamp.valueOf("9999-12-31 00:00:00")
    val ivs = Seq(("u", ts(0), ts(200), 1L),          // normal, grid path
      ("u", ts(1000), far, 2L),                        // open-ended
      ("v", ts(0), far, 3L)).toDF("k", "lo", "hi", "iid")
    val out = Joins.rangeJoin(pts, ivs, Seq("k"), "p", "lo", "hi")
      .select("iid", "p").as[(Long, Timestamp)].collect().toSeq
    assert(out.sorted == Seq((1L, ts(100)), (2L, ts(7300)),
      (3L, ts(500))).sorted)
    // keyless flavor with a sentinel interval must also complete
    val keyless = Joins.rangeJoin(pts.select("p"),
      ivs.filter($"iid" === 2L).select("lo", "hi", "iid"),
      Seq.empty, "p", "lo", "hi")
      .select("iid", "p").as[(Long, Timestamp)].collect().toSeq
    assert(keyless.sorted == Seq((2L, ts(7300))).sorted)
  }

  test("rangeJoin on timestamps: interval spanning many cells, once each") {
    val pts = Seq(("u", ts(100)), ("u", ts(7300)), ("u", ts(90000)))
      .toDF("k", "p")
    val ivs = Seq(("u", ts(0), ts(7400), 1L), // spans 3 one-hour cells
      ("u", ts(7400), ts(8000), 2L)).toDF("k", "lo", "hi", "iid")
    val out = Joins.rangeJoin(pts, ivs, Seq("k"), "p", "lo", "hi")
      .select("iid", "p").as[(Long, Timestamp)].collect().toSeq
    assert(out.sorted == Seq((1L, ts(100)), (1L, ts(7300))).sorted)
  }

  test("saltedJoin == plain equi-join on a skewed fixture, inner and left") {
    // 90% of the big side lands on one hot key
    val big = (1 to 200).map(i =>
      (if (i <= 180) "hot" else s"k${i % 7}", i.toLong)).toDF("k", "v")
    val small = Seq(("hot", 1.0), ("k1", 2.0), ("k3", 3.0), ("unmatched", 9.0))
      .toDF("k", "w")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val salted = Joins.saltedJoin(big, small, Seq("k"), salts = 8, jt)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(salted == plain, s"$jt salted join diverged")
    }
    // the join key actually includes the salt (the whole point):
    // one hot key occupies `salts` shuffle cells, not one
    val plan = Joins.saltedJoin(big, small, Seq("k"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
  }

  test("fuzzyPairs: finds in-block typo pairs, enforces threshold and id order") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tail"),
      (2L, "the quick brown fox jumps over the lazy dog tails"), // 1 edit
      (3L, "the quick brown cat jumps over the lazy dog tail"),  // 3 edits vs 1
      (4L, "a completely different document body here now"),
      (5L, "the quick brown fox leaps over the hazy bog swamps then rambles on for a while") // same block, far length
    ).toDF("id", "text")
    val pairs = Joins.fuzzyPairs(docs, "id", "text",
        blockLen = 6, prefixLen = 40, maxDist = 5, lenBand = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // 1-2 (dist 0 on the 40-prefix... their prefixes differ only past
    // 40 chars), 1-3 and 2-3 (3 edits within the prefix); 5 shares the
    // block but sits in another length band; 4 is in another block
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"got $pairs")
    assert(pairs.forall(p => p._1 < p._2 && p._3 <= 5))
    // the equi-join blocking plans NO cartesian product
    val plan = Joins.fuzzyPairs(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("joinCardinality equals the materialized join's count, fact-free") {
    import org.apache.spark.sql.functions.col
    val l = Seq(1, 1, 1, 2, 3, 5).toDF("k")
    val r = Seq(1, 2, 2, 4).toDF("rk")
    val est = Joins.joinCardinality(l, col("k"), r, col("rk"))
      .as[Long].head()
    val actual = l.join(r, col("k") === col("rk")).count()
    assert(est == actual && est == 5L) // 3*1 + 1*2
    // empty overlap degrades to 0, not null
    val none = Joins.joinCardinality(l, col("k"),
      Seq(9).toDF("rk"), col("rk")).as[Long].head()
    assert(none == 0L)
  }

  test("joinBlowupKeys ranks keys by output contribution with ties on key") {
    import org.apache.spark.sql.functions.col
    val l = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val r = Seq("a", "b", "b", "b", "c").toDF("rk")
    val out = Joins.joinBlowupKeys(l, col("k"), r, col("rk"), 2)
      .as[(String, Long, Long, Long)].collect().toSeq
    // b: 2*3=6 beats a: 3*1=3; c: 1*1=1 cut by k=2
    assert(out == Seq(("b", 2L, 3L, 6L), ("a", 3L, 1L, 3L)))
    // the preflight must rank through TakeOrderedAndProject, and the
    // contribution sum over ALL keys matches joinCardinality
    val plan = Joins.joinBlowupKeys(l, col("k"), r, col("rk"), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val full = Joins.joinBlowupKeys(l, col("k"), r, col("rk"), 100)
      .agg(org.apache.spark.sql.functions.sum("out_rows")).as[Long].head()
    assert(full == Joins.joinCardinality(l, col("k"), r, col("rk"))
      .as[Long].head())
  }
}
