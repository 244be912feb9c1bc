package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression, RandomForestRegressor}
import org.apache.spark.ml.{Model, Pipeline, PipelineModel}
import org.apache.spark.sql.DataFrame

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** ML surface (SURVEY.md §2.11 M1–M8), replicated with spark.ml.
  *
  * Hyper-parameters mirror the reference exactly:
  *  - LinearRegression maxIter 50, regParam 0.01, elasticNet 0.5
  *    (`NEW_train_offset_3_10min.py:55-57`)
  *  - RandomForest 100 trees depth 10, GBT 100 iters depth 5
  *    (`stream_and_historical_model.py:171-184`)
  */
object Regression {

  /** M1 — feature assembler. Reference `NEW_train_offset_3_10min.py:140-143`. */
  def assembler(features: Seq[String]): VectorAssembler =
    new VectorAssembler()
      .setInputCols(features.toArray)
      .setOutputCol("features")
      .setHandleInvalid("skip")

  /** M2/M7 — assembler + LinearRegression pipeline. */
  def linearPipeline(features: Seq[String]): Pipeline =
    new Pipeline().setStages(Array(
      assembler(features),
      new LinearRegression()
        .setMaxIter(50).setRegParam(0.01).setElasticNetParam(0.5)
        .setLabelCol("label").setFeaturesCol("features")))

  /** M3 — the reference's model zoo, by name. */
  def zoo(features: Seq[String]): Map[String, Pipeline] = Map(
    "linear" -> linearPipeline(features),
    "random_forest" -> new Pipeline().setStages(Array(
      assembler(features),
      new RandomForestRegressor()
        .setNumTrees(100).setMaxDepth(10).setSeed(42L)
        .setLabelCol("label").setFeaturesCol("features"))),
    "gbt" -> new Pipeline().setStages(Array(
      assembler(features),
      new GBTRegressor()
        .setMaxIter(100).setMaxDepth(5).setSeed(42L)
        .setLabelCol("label").setFeaturesCol("features"))))

  /** F1 — the reference's only Python UDF (`features_to_json`, Vector →
    * JSON string, `NEW_train_offset_3_10min.py:244-248`) replaced by
    * pure built-ins: vector_to_array + map_from_arrays + to_json. No
    * UDF, no worker boundary, stays in codegen. */
  def featuresToJson(featuresCol: org.apache.spark.sql.Column,
      names: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    to_json(map_from_arrays(
      array(names.map(lit(_)): _*),
      org.apache.spark.ml.functions.vector_to_array(featuresCol)))
  }

  /** M4 — rmse/mae/r2 evaluation. Reference
    * `stream_and_historical_model.py:187-217`. */
  def evaluate(predictions: DataFrame): Map[String, Double] = {
    def ev(metric: String) = new RegressionEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .setMetricName(metric).evaluate(predictions)
    Map("rmse" -> ev("rmse"), "mae" -> ev("mae"), "r2" -> ev("r2"))
  }

  /** M5/M6 — train every zoo model on a seeded 80/20 split, pick the
    * champion by min holdout RMSE. Reference
    * `stream_and_historical_model.py:160,229-251`. */
  def trainSelect(df: DataFrame, features: Seq[String])
      : (String, PipelineModel, Map[String, Double]) = {
    val Array(train, test) = df.randomSplit(Array(0.8, 0.2), 42L)
    val scored = zoo(features).map { case (name, pipe) =>
      val model = pipe.fit(train)
      (name, model, evaluate(model.transform(test)))
    }
    scored.minBy(_._3("rmse"))
  }
}

/** T9 — continuous-training model store with the reference's
  * "latest pointer" protocol: each trained model saved under a
  * monotonically-named dir, `latest_model.txt` updated to point at it
  * (`NEW_train_offset_3_10min.py:153-211`). Loading follows the pointer.
  * Crash between save and pointer-update leaves the previous model
  * active (at-least-once training, never a dangling pointer).
  */
final class ModelStore(root: String) {
  private val pointer = Paths.get(root, "latest_model.txt")

  def save(model: PipelineModel, batchId: Long): String = {
    Files.createDirectories(Paths.get(root))
    val dir = Paths.get(root, f"model_$batchId%012d").toString
    model.write.overwrite().save(dir)
    Files.write(pointer, dir.getBytes(StandardCharsets.UTF_8))
    dir
  }

  def latestDir: Option[String] =
    if (Files.exists(pointer))
      Some(new String(Files.readAllBytes(pointer), StandardCharsets.UTF_8).trim)
    else None

  def loadLatest(): Option[PipelineModel] =
    latestDir.map(PipelineModel.load)
}
