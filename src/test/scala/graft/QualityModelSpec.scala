package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.llm.QualityModel
import graft.operators.Relational

/** Model-based quality filter: weak-label training, held-out accuracy,
  * store round-trip. */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("classifier learns the weak label and generalizes held-out") {
    val split = Relational.withHashSplit(docs, col("doc_id"), 10)
    val train = split.filter(col("split_bucket") < 8)
    val heldOut = split.filter(col("split_bucket") >= 8)
    // weak supervision: median-quality threshold on the training slice
    val tau = train.select(Text.qualityScore(col("text")).as("q"))
      .agg(expr("percentile(q, 0.5)")).head().getDouble(0)
    val weak = Text.qualityScore(col("text")) >= tau
    val model = QualityModel.train(train, "text", weak)
    val scored = QualityModel.score(model, heldOut, "text")
      .withColumn("truth", weak.cast("int"))
    val rows = scored.select(col("p_good"), col("truth")).collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (p, _) => p >= 0.0 && p <= 1.0 })
    val acc = rows.count { case (p, t) =>
      (if (p >= 0.5) 1 else 0) == t }.toDouble / rows.length
    assert(acc >= 0.85, s"held-out accuracy $acc")
    // the filter keeps a strict, non-empty subset at a tight threshold
    val kept = QualityModel.filterByModel(model, heldOut, "text", 0.9)
    val n = kept.count()
    assert(n > 0 && n < heldOut.count())
  }

  test("null-text docs are skipped, not an NPE (HashingTF has no null path)") {
    val withNull = docs.limit(20)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, lit(null)).otherwise(col("text")))
    val weak = coalesce(Text.qualityScore(col("text")), lit(0.0)) >= lit(0.3)
    val model = QualityModel.train(withNull, "text", weak,
      numFeatures = 256, maxIter = 5)
    val scored = QualityModel.score(model, withNull, "text")
    // null-text rows are dropped by the assembler's skip, the rest score
    assert(scored.count() == withNull.filter(col("text").isNotNull).count())
    assert(scored.filter(col("p_good").isNull).isEmpty)
  }

  test("model store round-trips the classifier pipeline") {
    val weak = Text.qualityScore(col("text")) >= lit(0.3)
    val model = QualityModel.train(docs.limit(200), "text", weak,
      numFeatures = 256, maxIter = 10)
    val store = new graft.ml.ModelStore(tmpDir("qmodel"))
    store.save(model, 1L)
    val loaded = store.loadLatest().get
    val a = QualityModel.score(model, docs.limit(50), "text")
      .select("doc_id", "p_good").as[(Long, Double)].collect().toMap
    val b = QualityModel.score(loaded, docs.limit(50), "text")
      .select("doc_id", "p_good").as[(Long, Double)].collect().toMap
    assert(a == b)
  }
}
