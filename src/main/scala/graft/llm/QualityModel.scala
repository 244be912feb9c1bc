package graft.llm

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, VectorAssembler}
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Model-based quality filtering — the classifier companion to the
  * heuristic ([[Text.qualityScore]]) and LM ([[LanguageModel]]) quality
  * signals: a hashed bag-of-words + numeric-stats logistic regression,
  * the shape of the fastText-style quality classifiers production
  * pretraining pipelines train on weak labels.
  *
  * Scale posture: featurization is per-row (tokens → HashingTF buckets,
  * stats from the single-pass text_stats kernel — map-only, no shuffle,
  * no vocabulary to fit since hashing needs no dictionary). Training
  * cost is the usual L-BFGS passes over the (sampled) training frame;
  * SCORING — the part that touches all 100 TB — is one broadcast of the
  * coefficient vector and a map-only transform.
  */
object QualityModel {

  /** Hashed token frequencies + numeric quality stats as `features`.
    * `numFeatures` buckets trade collision rate for width — 2^12 is
    * plenty for a quality signal (collisions act as regularization). */
  def featurizer(numFeatures: Int = 4096): Pipeline = {
    val tf = new HashingTF().setInputCol("__tokens")
      .setOutputCol("__tf").setNumFeatures(numFeatures)
    val asm = new VectorAssembler()
      .setInputCols(Array("__tf", "__stopword_ratio", "__punct_ratio",
        "__mean_token_len", "__n_tokens"))
      .setOutputCol("features").setHandleInvalid("skip")
    new Pipeline().setStages(Array(tf, asm))
  }

  /** The raw columns [[featurizer]] consumes, derived from `textCol`.
    * Null text yields an empty token array (HashingTF has no null
    * handling and would NPE) but null stats — so the assembler's
    * `handleInvalid=skip` drops null-text docs from train/score rather
    * than crashing the job. */
  def withRawFeatures(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("__tokens",
        Text.tokens(lower(coalesce(col(textCol), lit("")))))
      .withColumn("__stopword_ratio", Text.stopwordRatio(col(textCol)))
      .withColumn("__punct_ratio", Text.punctRatio(col(textCol)))
      .withColumn("__mean_token_len", Text.meanTokenLen(col(textCol)))
      .withColumn("__n_tokens",
        Text.tokenCount(col(textCol)).cast("double"))

  /** Train on weak supervision: label 1 where `weakLabel` holds (e.g.
    * `qualityScore >= τ` on a trusted slice, or membership in a
    * known-good corpus), 0 elsewhere. Returns the full
    * featurize+classify pipeline, save/load-able via
    * [[graft.ml.ModelStore]]. */
  def train(docs: DataFrame, textCol: String, weakLabel: Column,
      numFeatures: Int = 4096, maxIter: Int = 50): PipelineModel = {
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(0.01).setElasticNetParam(0.0)
      .setLabelCol("label").setFeaturesCol("features")
      .setProbabilityCol("__prob")
    val pipeline = new Pipeline().setStages(
      featurizer(numFeatures).getStages :+ lr)
    pipeline.fit(
      withRawFeatures(docs, textCol)
        .withColumn("label", weakLabel.cast("double")))
  }

  /** Score docs with a trained model: adds `p_good` (probability of the
    * positive class). Map-only over the corpus. */
  def score(model: PipelineModel, docs: DataFrame,
      textCol: String): DataFrame = {
    val scored = model.transform(withRawFeatures(docs, textCol))
    scored
      .withColumn("p_good",
        org.apache.spark.ml.functions.vector_to_array(col("__prob"))
          .getItem(1))
      .drop("__tokens", "__tf", "__stopword_ratio", "__punct_ratio",
        "__mean_token_len", "__n_tokens", "features", "rawPrediction",
        "__prob", "prediction")
  }

  /** Classifier-gated corpus filter: keep docs scoring at least
    * `minPGood`. The standard second-stage filter after heuristics. */
  def filterByModel(model: PipelineModel, docs: DataFrame,
      textCol: String, minPGood: Double): DataFrame =
    score(model, docs, textCol).filter(col("p_good") >= minPGood)
}
