package graft

import graft.ml.{ModelStore, Regression}

class MlSpec extends SparkSpec {
  import spark.implicits._

  // y = 2*a + 3*b + noise-free → linear model must nail it
  private lazy val df = (1 to 200).map { i =>
    val a = i.toDouble; val b = (i % 7).toDouble
    (a, b, 2 * a + 3 * b)
  }.toDF("a", "b", "label")

  test("linear pipeline fits an exact linear relation") {
    val model = Regression.linearPipeline(Seq("a", "b")).fit(df)
    val m = Regression.evaluate(model.transform(df))
    assert(m("rmse") < 0.5)
    assert(m("r2") > 0.999)
  }

  test("trainSelect picks the champion by holdout rmse") {
    val (name, model, metrics) = Regression.trainSelect(df, Seq("a", "b"))
    assert(Set("linear", "random_forest", "gbt").contains(name))
    assert(metrics.keySet == Set("rmse", "mae", "r2"))
    assert(model.transform(df).columns.contains("prediction"))
  }

  test("featuresToJson encodes assembled vectors without a UDF") {
    val assembled = Regression.assembler(Seq("a", "b")).transform(df.limit(1))
    val json = assembled.select(
      Regression.featuresToJson(org.apache.spark.sql.functions.col("features"),
        Seq("a", "b"))).as[String].collect().head
    assert(json == """{"a":1.0,"b":1.0}""")
  }

  test("ModelStore follows the latest-pointer protocol") {
    val root = tmpDir("models")
    val store = new ModelStore(root)
    assert(store.loadLatest().isEmpty)
    val m1 = Regression.linearPipeline(Seq("a", "b")).fit(df)
    store.save(m1, 1L)
    store.save(m1, 2L)
    assert(store.latestDir.get.endsWith("model_000000000002"))
    val loaded = store.loadLatest().get
    assert(loaded.transform(df).count() == 200)
  }
}
