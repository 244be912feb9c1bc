package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("topK keeps the k best with deterministic tie-breaks") {
    val df = Seq(
      ("a", 0.9, 1L), ("a", 0.5, 2L), ("a", 0.9, 3L), ("a", 0.7, 4L),
      ("b", 0.1, 5L))
      .toDF("k", "score", "id")
    val out = df.groupBy("k")
      .agg(TopKAgg.topK(2, col("score"), col("id")).as("top"))
      .orderBy("k")
      .select(col("k"), col("top").cast("array<struct<s:double,i:long>>"))
      .collect()
    val a = out(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(a == Seq((0.9, 1L), (0.9, 3L))) // tie -> smaller id first
    val b = out(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(b == Seq((0.1, 5L)))
  }

  test("topK agrees with the window row_number form on scored pairs") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 2000).map(_ =>
      (rnd.nextInt(5).toLong, rnd.nextDouble(), rnd.nextLong().abs))
      .toDF("q", "sim", "id")
    // window form
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q").orderBy(col("sim").desc, col("id"))
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("q"), col("sim"), col("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    // aggregator form
    val agged = df.groupBy("q")
      .agg(TopKAgg.topK(3, col("sim"), col("id")).as("top"))
      .select(col("q"), explode(col("top")).as("t"))
      .select(col("q"), col("t._1").as("sim"), col("t._2").as("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(agged == windowed)
  }
}
