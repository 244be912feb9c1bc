package graft.llm

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR — Xie et al. 2023,
  * arXiv:2302.03169): score raw-corpus documents by how much they look
  * like a TARGET distribution (e.g. curated high-quality text) under
  * hashed n-gram bag models, then keep the top-weighted slice. The
  * industrial data-selection technique for pretraining corpora —
  * unlike the absolute-quality unigram LM score ([[LanguageModel]]),
  * the weight is a RATIO of target vs raw likelihoods, so it selects
  * for "target-like", not merely "fluent".
  *
  * Scale shape: both distributions are fixed-width histograms over
  * `numBuckets` hashed n-gram buckets — each is one map-side-combined
  * aggregate whose output is bounded by the bucket count regardless of
  * corpus size, and the per-doc scoring pass joins n-gram rows against
  * that broadcast-sized log-ratio table. Nothing corpus-sized is
  * collected or broadcast; document text never shuffles (only (id,
  * bucket) pairs do). Hashing is the md5-prefix idiom shared with
  * [[graft.operators.Relational.withHashSplit]] — deterministic across
  * engines, runs and partitionings.
  */
object Dsir {

  /** (id, bucket) hashed word-n-gram rows; one row per n-gram
    * OCCURRENCE (bag semantics, per the DSIR construction). Staging via
    * the shared [[Dedup.ngramRows]]; the md5-prefix bucket is the
    * engine-stable idiom of [[graft.operators.Relational.withHashSplit]]. */
  private def ngramBucketRows(df: DataFrame, idCol: String,
      textCol: String, n: Int, numBuckets: Int): DataFrame =
    Dedup.ngramRows(df, idCol, textCol, n, lowercase = true)
      .select(col("id"),
        (conv(substring(md5(col("gram")), 1, 6), 16, 10)
          .cast("long") % numBuckets).as("bucket"))

  /** Hashed n-gram histogram of a corpus: (bucket, cnt). Output
    * cardinality <= numBuckets — fixed, broadcastable. */
  def bucketCounts(df: DataFrame, textCol: String, n: Int = 2,
      numBuckets: Int = 10000): DataFrame =
    ngramBucketRows(df.select(lit(0L).as("__id"), col(textCol)),
        "__id", textCol, n, numBuckets)
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-document importance weight: the mean over the doc's n-gram
    * occurrences of log p_target(bucket) - log p_raw(bucket), both
    * Laplace-smoothed ((c+1)/(T+B)). Positive = more target-like than
    * the raw corpus average. Output: (idCol, n_ngrams, weight) with
    * weight rounded to 6 dp (engine-stable). Docs with fewer than n
    * tokens have no n-grams and are omitted (they carry no evidence).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, n: Int = 2, numBuckets: Int = 10000): DataFrame = {
    val rawCounts = bucketCounts(raw, textCol, n, numBuckets)
    val tgtCounts = bucketCounts(target, textCol, n, numBuckets)
    // scalar totals ride along as broadcast 1-row frames (no collect)
    val totals = broadcast(
      rawCounts.agg(sum(col("cnt")).as("t_raw")).crossJoin(
        tgtCounts.agg(sum(col("cnt")).as("t_tgt"))))
    val ratio = broadcast(
      rawCounts.select(col("bucket"), col("cnt").as("c_raw"))
        .join(tgtCounts.select(col("bucket"), col("cnt").as("c_tgt")),
          Seq("bucket"), "full_outer")
        .crossJoin(totals)
        .select(col("bucket"),
          (log((coalesce(col("c_tgt"), lit(0L)) + 1).cast("double") /
              (col("t_tgt") + numBuckets)) -
            log((coalesce(col("c_raw"), lit(0L)) + 1).cast("double") /
              (col("t_raw") + numBuckets))).as("log_ratio")))
    // buckets absent from BOTH corpora (left-join miss) still have a
    // well-defined smoothed ratio — coalesce below computes it
    ngramBucketRows(raw, idCol, textCol, n, numBuckets)
      .join(ratio, Seq("bucket"), "left")
      .crossJoin(totals.select(col("t_raw").as("__tr"), col("t_tgt").as("__tt")))
      .select(col("id"),
        coalesce(col("log_ratio"),
          log(lit(1.0) / (col("__tt") + numBuckets)) -
            log(lit(1.0) / (col("__tr") + numBuckets))).as("lr"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        round(avg(col("lr")), 6).as("weight"))
  }

  /** DSIR selection: the k most target-like documents of the raw
    * corpus. Ordered by (rounded weight desc, id asc) so ties at 6 dp
    * cannot flip between engines; plan is TakeOrdered (bounded heap),
    * not a global sort. */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, n: Int = 2,
      numBuckets: Int = 10000): DataFrame =
    graft.operators.Relational.topK(k,
      Seq(col("weight").desc, col(idCol)), Seq.empty)(
      importanceWeights(raw, target, idCol, textCol, n, numBuckets))
}
