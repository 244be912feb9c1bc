package graft

import graft.etl.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1L to 5000L).map(i => (i, s"a$i")).toDF("k", "av")
      val b = (1L to 5000L).map(i => (i, i * 2.0)).toDF("k", "bv")
      Layout.writeBucketed(a, "bkt_a", 8, "k", Seq("k"))
      Layout.writeBucketed(b, "bkt_b", 8, "k", Seq("k"))
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 5000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("saltedJoin splits hot keys and preserves join semantics") {
    // heavily skewed: 90% of rows share key 1
    val big = ((1 to 900).map(i => (1L, s"hot$i")) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, s"cold$i"))).toDF("k", "tag")
    val small = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"),
      (5L, "five"), (6L, "six"), (7L, "seven"), (8L, "eight"))
      .toDF("k", "name")
    val plain = big.join(small, "k").count()
    val salted = Layout.saltedJoin(big, small, "k", 4,
      saltSource = concat(col("tag"), col("k")))
    assert(salted.count() == plain)
    // every salt bucket of the hot key carries some rows
    val saltSpread = big.withColumn("__salt",
      pmod(hash(concat(col("tag"), col("k"))), lit(4)))
      .filter(col("k") === 1L).select("__salt").distinct().count()
    assert(saltSpread >= 2, "salting must actually spread the hot key")
  }

  test("copartitioned frames share the partitioning") {
    val Seq(a, b) = Layout.copartition(Seq(
      (1L to 100L).map(i => (i, i)).toDF("k", "x"),
      (1L to 100L).map(i => (i, i * 2)).toDF("k", "y")), "k", 8)
    assert(a.rdd.getNumPartitions == 8 && b.rdd.getNumPartitions == 8)
    assert(a.join(b, "k").count() == 100)
  }

  test("bloomPrune keeps every matching row and prunes most others") {
    val large = (1L to 100000L).map(i => (i, i % 97)).toDF("k", "v")
    val small = (1L to 100L).map(i => (i * 1000L, s"s$i")).toDF("k", "name")
    val pruned = Layout.bloomPrune(large, col("k"), small, col("k"),
      expectedItems = 1000L)
    // no false negatives: the pruned join equals the plain join
    val plain = large.join(small, "k").orderBy("k").collect()
    val viaBloom = pruned.join(small, "k").orderBy("k").collect()
    assert(viaBloom.toSeq == plain.toSeq)
    // and the filter actually prunes (100 true keys + ~1% FP of 100k)
    val kept = pruned.count()
    assert(kept >= 100 && kept < 10000L,
      s"bloom kept $kept of 100000 rows — not pruning")
  }
}
