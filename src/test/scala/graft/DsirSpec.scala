package graft

import graft.llm.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling: target-like docs must outscore
  * target-unlike docs, deterministically. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // "clean" docs share the target's vocabulary; "spam" docs don't
  private val clean = (0L until 6L).map(i =>
    (i, s"the quick brown fox jumps over the lazy dog number $i", "clean"))
  private val spam = (6L until 12L).map(i =>
    (i, s"buy cheap pills now click here winner prize $i", "spam"))
  private val raw = (clean ++ spam).toDF("doc_id", "text", "kind")
  private val target = clean.take(3).toDF("doc_id", "text", "kind")

  test("clean docs outweigh spam docs against a clean target") {
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .join(raw.select("doc_id", "kind"), "doc_id")
      .groupBy("kind").agg(avg(col("weight")).as("mw"))
      .as[(String, Double)].collect().toMap
    assert(w("clean") > w("spam"),
      s"clean ${w("clean")} should beat spam ${w("spam")}")
  }

  test("select returns the target-like slice first, deterministically") {
    val top = Dsir.select(raw, target, "doc_id", "text", 6)
      .select("doc_id").as[Long].collect().toSet
    assert(top == (0L until 6L).toSet)
    // repeated run identical (md5 hashing, rounded-weight ordering)
    val again = Dsir.select(raw, target, "doc_id", "text", 6)
      .select("doc_id").as[Long].collect().toSet
    assert(again == top)
  }

  test("docs with fewer than n tokens are omitted (no evidence)") {
    val d = Seq((0L, "one"), (1L, "two words here")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(d, d, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(w == Set(1L))
  }

  test("identical raw and target distributions give ~zero weights") {
    val d = clean.toDF("doc_id", "text", "kind")
    val w = Dsir.importanceWeights(d, d, "doc_id", "text")
      .select("weight").as[Double].collect()
    assert(w.forall(x => math.abs(x) < 1e-6), w.mkString(","))
  }
}
