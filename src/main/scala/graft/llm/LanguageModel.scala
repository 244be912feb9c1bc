package graft.llm

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics language-model scoring (north-star text-analysis
  * surface): the CCNet/RedPajama-shaped quality signal — score each
  * document by the average log-probability of its tokens under a
  * unigram model fitted on the corpus itself. Gibberish and
  * vocabulary-poor documents score far from the corpus mean and are
  * filter candidates; no external model needed.
  */
object LanguageModel {

  /** (idCol, n_tokens, avg_logp) per document, where avg_logp is the
    * mean natural-log unigram probability of the doc's tokens (token
    * probabilities are corpus-relative frequencies).
    *
    * Scale shape: one token explode, one frequency aggregation
    * (map-side combined), one join back keyed by token, one per-doc
    * aggregation — every shuffle keyed by token or doc id. The
    * single-row total rides along as a broadcast. */
  def unigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(Text.tokens(lower(col(textCol)))).as("w"))
    val freq = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum(col("cnt")).as("tot"))
    toks.join(freq, "w")
      .crossJoin(broadcast(tot))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("cnt").cast("double") / col("tot"))), 6)
          .as("avg_logp"))
  }
}
