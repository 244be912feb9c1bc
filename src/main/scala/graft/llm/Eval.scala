package graft.llm

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference-based text-overlap evaluation — ROUGE-N (Lin 2004) and
  * BLEU (Papineni 2002) over (candidate, reference) text pairs: the
  * generation-eval half of the retrieval metrics in [[Relevance]]
  * (NDCG/MRR grade a RANKING against labels; these grade generated
  * TEXT against a reference). In a training-data pipeline the same
  * kernels serve as symmetric-overlap detectors: a candidate scoring
  * near-1.0 ROUGE against a held-out reference is an eval-set leak the
  * fingerprint/MinHash dedup family measures from a different angle.
  *
  * Scale shape: one token explode per side keyed by (pair id, gram) —
  * hash partial-aggregates map-side, the pair texts shuffle only as
  * n-gram count rows (never whole documents), and the per-pair
  * reduction is a single hash aggregate on the pair id. No windows, no
  * driver collects; the same profile as [[Relevance.bm25]].
  *
  * Determinism: tokenization is the shared [[Text.tokens]] whitespace
  * norm; scores are ROUNDED (`scale` dp) so the emitted values are
  * bit-stable across engines — raw FP quotients can differ in the last
  * ulp between ln/exp implementations (the [[Relevance.tfidfTopTerms]]
  * rounding rationale).
  */
object Eval {

  /** (id, g, c) n-gram multiset counts of `textCol`, one row per
    * DISTINCT gram per pair — multiplicity rides in `c` so clipped
    * overlap is `least(c_cand, c_ref)` on the joined row. */
  private def gramCounts(pairs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = pairs.select(col(idCol).as("id"),
      split(lower(Text.normWs(col(textCol))), " ").as("__toks"))
    val grams =
      if (n == 1) toks.select(col("id"), explode(col("__toks")).as("g"))
      else toks.select(col("id"),
        explode(Text.shinglesAllFromTokens(col("__toks"), n)).as("g"))
    grams.groupBy("id", "g").agg(count(lit(1)).as("c"))
  }

  /** Per-pair clipped n-gram overlap: (id, ov, ct, rt) = clipped
    * matches, candidate gram total, reference gram total. Full-outer on
    * (id, gram) so one side's exclusive grams still count toward its
    * total; every input pair keeps a row via the left join from the
    * id spine (a pair whose texts are both shorter than n grams would
    * otherwise vanish instead of scoring 0). */
  private def overlapCounts(pairs: DataFrame, idCol: String,
      candCol: String, refCol: String, n: Int): DataFrame = {
    val cand = gramCounts(pairs, idCol, candCol, n)
      .withColumnRenamed("c", "cc")
    val ref = gramCounts(pairs, idCol, refCol, n)
      .withColumnRenamed("c", "rc")
    val joined = cand.join(ref, Seq("id", "g"), "full_outer")
      .groupBy("id").agg(
        sum(least(coalesce(col("cc"), lit(0L)),
          coalesce(col("rc"), lit(0L)))).as("ov"),
        sum(coalesce(col("cc"), lit(0L))).as("ct"),
        sum(coalesce(col("rc"), lit(0L))).as("rt"))
    pairs.select(col(idCol).as("id")).join(joined, Seq("id"), "left")
      .na.fill(0L, Seq("ov", "ct", "rt"))
  }

  /** ROUGE-N per pair: clipped n-gram precision / recall / F1.
    * Output: (idCol, rouge_p, rouge_r, rouge_f), scores rounded to
    * `scale` dp; an empty side scores 0, not null. */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, n: Int, scale: Int = 6): DataFrame = {
    val oc = overlapCounts(pairs, idCol, candCol, refCol, n)
    val p = when(col("ct") > 0,
      col("ov").cast("double") / col("ct")).otherwise(0.0)
    val r = when(col("rt") > 0,
      col("ov").cast("double") / col("rt")).otherwise(0.0)
    oc.withColumn("__p", p).withColumn("__r", r)
      .withColumn("rouge_f", round(when(col("__p") + col("__r") > 0,
        lit(2.0) * col("__p") * col("__r") / (col("__p") + col("__r")))
        .otherwise(0.0), scale))
      .select(col("id").as(idCol),
        round(col("__p"), scale).as("rouge_p"),
        round(col("__r"), scale).as("rouge_r"),
        col("rouge_f"))
  }

  /** (id, n, g, c) gram counts for ALL orders 1..maxN in ONE scan of
    * `textCol`: every n's shingle array is built from the same staged
    * token array, tagged with its order, and exploded together — the
    * corpus is read once per side regardless of maxN (the per-n
    * [[gramCounts]] form re-scans it maxN times; at 100 TB the scan is
    * the cost). n=1 rides the raw token array. */
  private def gramCountsAllN(pairs: DataFrame, idCol: String,
      textCol: String, maxN: Int): DataFrame = {
    val toks = pairs.select(col(idCol).as("id"),
      split(lower(Text.normWs(col(textCol))), " ").as("__toks"))
    val tagged = (1 to maxN).map { n =>
      val grams = if (n == 1) col("__toks")
        else Text.shinglesAllFromTokens(col("__toks"), n)
      transform(grams, g => struct(lit(n).as("n"), g.as("g")))
    }
    toks.select(col("id"),
        explode(concat(tagged: _*)).as("__t"))
      .select(col("id"), col("__t.n").as("n"), col("__t.g").as("g"))
      .groupBy("id", "n", "g").agg(count(lit(1)).as("c"))
  }

  /** BLEU-maxN per pair (geometric mean of clipped n-gram precisions
    * for n = 1..maxN, times the brevity penalty
    * min(1, exp(1 - refLen/candLen))). Unsmoothed: any zero precision
    * zeroes the score — the corpus-overlap screening use wants the
    * hard zero, and the unsmoothed form is what a SQL oracle can state
    * exactly. Output: (idCol, bleu_p1..pN, brevity_penalty, bleu),
    * rounded to `scale` dp.
    *
    * Plan shape: ONE tagged-gram explode per side (all n orders in a
    * single corpus scan), one (id, n, g) full-outer join, one (id, n)
    * clip aggregate, then a per-id pivot. Token lengths fall out of
    * the n=1 totals for free — no separate length pass. */
  def bleu(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 2, scale: Int = 6): DataFrame = {
    require(maxN >= 1)
    val cand = gramCountsAllN(pairs, idCol, candCol, maxN)
      .withColumnRenamed("c", "cc")
    val ref = gramCountsAllN(pairs, idCol, refCol, maxN)
      .withColumnRenamed("c", "rc")
    val perN = cand.join(ref, Seq("id", "n", "g"), "full_outer")
      .groupBy("id", "n").agg(
        sum(least(coalesce(col("cc"), lit(0L)),
          coalesce(col("rc"), lit(0L)))).as("ov"),
        sum(coalesce(col("cc"), lit(0L))).as("ct"),
        sum(coalesce(col("rc"), lit(0L))).as("rt"))
    // pivot: one row per pair. A pair lacking (id, n) rows entirely
    // (both texts shorter than n) scores that precision 0, matching
    // the id-spine semantics of rougeN; n=1 rows always exist (the
    // token array is never empty), so clen/rlen are total.
    val pn = (1 to maxN).map(n => coalesce(
      max(when(col("n") === n, when(col("ct") > 0,
        col("ov").cast("double") / col("ct")).otherwise(0.0))),
      lit(0.0)).as(s"__p$n"))
    val lenCols = Seq(
      max(when(col("n") === 1, col("ct"))).cast("double").as("clen"),
      max(when(col("n") === 1, col("rt"))).cast("double").as("rlen"))
    val aggCols = pn ++ lenCols
    val joined = pairs.select(col(idCol).as("id"))
      .join(perN.groupBy("id").agg(aggCols.head, aggCols.tail: _*),
        Seq("id"), "left")
      .na.fill(0.0)
    val bp = when(col("clen") >= col("rlen"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("rlen") / col("clen")))
    val allPos = (1 to maxN).map(n => col(s"__p$n") > 0)
      .reduce(_ && _) && col("clen") > 0
    val logMean = (1 to maxN).map(n => log(col(s"__p$n")))
      .reduce(_ + _) / lit(maxN.toDouble)
    val outCols = Seq(col("id").as(idCol)) ++
      (1 to maxN).map(n => round(col(s"__p$n"), scale).as(s"bleu_p$n")) ++
      Seq(round(col("__bp"), scale).as("brevity_penalty"),
        round(when(allPos, col("__bp") * exp(logMean)).otherwise(0.0),
          scale).as("bleu"))
    joined.withColumn("__bp", bp).select(outCols: _*)
  }
}
