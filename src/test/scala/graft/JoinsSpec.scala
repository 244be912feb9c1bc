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
}
