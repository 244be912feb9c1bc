package graft.llm

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial naive Bayes text classifier whose training AND scoring
  * are pure relational aggregates — the from-first-principles
  * classifier next to the Spark-ML wrappers in [[graft.ml.Regression]]
  * and the hashed-BoW logistic model in [[QualityModel]]: because both
  * phases are plain counts + logs, the ENTIRE train→score→argmax chain
  * is SQL-stateable and hash-checked against the oracle (no other
  * classifier in the engine has an exact cross-engine oracle).
  * Pipeline duty: cheap high-throughput label propagation (language,
  * domain, topic) where a 100 TB scoring pass must stay map-heavy.
  *
  * Laplace-smoothed: P(tok|lab) = (c_{lab,tok} + α) / (c_lab + α·V)
  * with V = train vocabulary size; unseen tokens contribute the α
  * floor per class. Tokenization is the engine-wide [[Text.tokens]]
  * whitespace convention.
  *
  * Scale shape: training is two hash aggregates over the token stream
  * (map-side combined); scoring joins the (id, tok, k) test counts to
  * the vocab-sized likelihood table on tok — labels ride a small
  * broadcast, docs with no tokens keep their prior via the doc×label
  * spine, and the argmax is a per-doc window over |labels| rows.
  * Scores round before ranking so the argmax is engine-stable. */
object NaiveBayes {

  def classify(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, labelCol: String, alpha: Double = 1.0,
      scale: Int = 6): DataFrame = {
    require(alpha > 0.0, "alpha must be positive")
    val trTok = train.select(col(labelCol).as("__lab"),
        explode(Text.tokens(col(textCol))).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .localCheckpoint(false) // feeds ctl, cl and V
    val ctl = trTok.groupBy(col("__lab"), col("__tok"))
      .agg(count(lit(1)).as("__ctl"))
      .localCheckpoint(false) // feeds the score join and cl
    val cl = ctl.groupBy(col("__lab")).agg(sum(col("__ctl")).as("__cl"))
    val v = broadcast(trTok.agg(countDistinct(col("__tok")).as("__v")))
    val priors = broadcast(
      train.groupBy(col(labelCol).as("__lab")).agg(count(lit(1)).as("__nd"))
        .crossJoin(broadcast(train.agg(count(lit(1)).as("__ndall")))))
    val teTok = test.select(col(idCol),
        explode(Text.tokens(col(textCol))).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__k"))
    val contrib = teTok.crossJoin(broadcast(cl))
      .join(ctl, Seq("__lab", "__tok"), "left")
      .crossJoin(v)
      .groupBy(col(idCol), col("__lab"))
      .agg(sum(col("__k") *
        log((coalesce(col("__ctl"), lit(0L)) + lit(alpha)) /
          (col("__cl") + lit(alpha) * col("__v")))).as("__s"))
    // doc×label spine: tokenless docs still get a prior-only score
    val spine = test.select(col(idCol))
      .crossJoin(broadcast(cl.select(col("__lab"))))
    val scored = spine.join(contrib, Seq(idCol, "__lab"), "left")
      .join(priors, Seq("__lab"))
      .withColumn("__score", round(
        log(col("__nd") / col("__ndall")) + coalesce(col("__s"), lit(0.0)),
        scale))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__score").desc, col("__lab"))
    val out = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__lab").as("pred"), col("__score").as("score"))
      .localCheckpoint(false)
    org.apache.spark.sql.graft.Bridge.releaseFrame(trTok)
    org.apache.spark.sql.graft.Bridge.releaseFrame(ctl)
    out
  }
}
