package graft.llm

import graft.functions.Text
import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composition a 100 TB
  * data pipeline actually runs, built from the library's verified
  * pieces:
  *
  *   1. dedup: exact fingerprints + MinHash near-dup clusters
  *      ([[Dedup.dedupCorpus]])
  *   2. quality filtering: heuristic score, intra-doc repetition,
  *      unigram-LM log-probability ([[Text]], [[LanguageModel]])
  *   3. decontamination: drop training docs overlapping a held-out
  *      eval set ([[Dedup.contamination]])
  *   4. deterministic split assignment ([[Relational.withHashSplit]])
  *
  * Every stage is shuffle-bounded by (doc id | 8-byte hash) keys; no
  * stage widens rows with payload-carrying joins (filters are
  * left_semi / left_anti on id sets).
  */
object CorpusPipeline {

  final case class Config(
      shingleN: Int = 3,
      minQuality: Double = 0.0,
      maxRepetition: Double = 1.0,
      minAvgLogProb: Double = Double.NegativeInfinity,
      maxContamination: Double = 0.5,
      splitBuckets: Int = 10,
      /** When set, strip lines occurring in >= this many distinct docs
        * (C4 boilerplate removal, [[Lines.stripBoilerplate]]) before
        * any document-level stage; fully-stripped docs are dropped. */
      boilerplateMinDocFreq: Option[Int] = None,
      /** When set, remove corpus-duplicated token spans of this window
        * size, keeping one occurrence ([[Dedup.removeRepeatedSpans]]);
        * fully-emptied docs are dropped. */
      spanDedupN: Option[Int] = None,
      /** When set, keep-first paragraph dedup on this separator
        * ([[Lines.dedupParagraphs]]) runs between the line and span
        * stages; fully-emptied docs are dropped. */
      paraDedupSep: Option[String] = None,
      /** When set, the final train/val/test split is LEAKAGE-SAFE
        * ([[Dedup.leakageSafeSplit]] at this exact-jaccard threshold):
        * near-dup groups never straddle a split boundary. Default is
        * the plain per-doc hash split. */
      leakageSafeMinJaccard: Option[Double] = None)

  /** Rewrite `textCol` with a cleaning stage's clean_text, keeping all
    * other columns; docs whose text is emptied by the cleaner drop out
    * (C4 drops boilerplate-only pages the same way). */
  private def rewriteText(docs: DataFrame, idCol: String, textCol: String,
      cleaned: DataFrame): DataFrame =
    docs.drop(textCol)
      .join(cleaned.select(col("id").as(idCol),
        col("clean_text").as(textCol)), Seq(idCol))
      .filter(length(col(textCol)) > 0)

  /** Returns the cleaned corpus: input columns + quality/split columns
    * (`quality`, `rep_ratio`, `avg_logp`, `split_bucket`), with
    * boilerplate lines / duplicated spans (when configured), duplicate,
    * low-quality and eval-contaminated docs removed. */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
      evalSet: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame = {
    // sub-document surgery first (C4 order): line-level boilerplate,
    // then span-level dedup, so document-level fingerprints/shingles
    // see the cleaned text
    val afterLines = cfg.boilerplateMinDocFreq match {
      case Some(k) => rewriteText(docs, idCol, textCol,
        Lines.stripBoilerplate(docs, idCol, textCol, k))
      case None => docs
    }
    val afterParas = cfg.paraDedupSep match {
      case Some(sep) => rewriteText(afterLines, idCol, textCol,
        Lines.dedupParagraphs(afterLines, idCol, textCol, sep))
      case None => afterLines
    }
    val base = cfg.spanDedupN match {
      case Some(n) => rewriteText(afterParas, idCol, textCol,
        Dedup.removeRepeatedSpans(afterParas, idCol, textCol, n))
      case None => afterParas
    }
    val deduped = Dedup.dedupCorpus(base, idCol, textCol, cfg.shingleN)
    val scored = deduped
      .withColumn("quality", Text.qualityScore(col(textCol)))
      .withColumn("rep_ratio", Text.repetitionRatio(col(textCol)))
    val lm = LanguageModel.unigramScore(deduped, idCol, textCol)
      .select(col(idCol), col("avg_logp"))
    // docs absent from the LM frame (zero tokens) coalesce to -inf —
    // the WORST score — so they pass only when the threshold is the
    // permissive -inf default, never a finite quality bar
    val filtered = scored
      .join(lm, Seq(idCol), "left")
      .filter(col("quality") >= cfg.minQuality &&
        col("rep_ratio") <= cfg.maxRepetition &&
        coalesce(col("avg_logp"), lit(Double.NegativeInfinity)) >=
          cfg.minAvgLogProb)
    val decontaminated = evalSet match {
      case Some(ev) =>
        // screen-then-exact: the map-only bloom screen never
        // under-reports (upper bound), so running the exact
        // shingle-join only on flagged docs loses nothing — and the
        // full corpus is never shuffled for decontamination
        val flagged = Dedup.contaminationScreen(
            filtered, ev, idCol, textCol, cfg.shingleN)
          .filter(col("est_contamination") >= cfg.maxContamination)
          .select(idCol)
        val confirmed = Dedup.contamination(
            filtered.join(flagged, Seq(idCol), "left_semi"),
            ev, idCol, textCol, cfg.shingleN)
          .filter(col("contamination") >= cfg.maxContamination)
          .select(idCol)
        filtered.join(confirmed, Seq(idCol), "left_anti")
      case None => filtered
    }
    cfg.leakageSafeMinJaccard match {
      case Some(j) =>
        // split key = near-dup component: survivors of doc-level dedup
        // can still be near-dups just UNDER its threshold — without
        // this, a test doc's almost-duplicate lands in train.
        // Materialized seam: this frame feeds THREE branches (the
        // similarity-join shingle scan, the component node set, and
        // the output join) — Spark plans are trees, so without the
        // checkpoint each branch re-runs the whole upstream pipeline
        // (the incrementalDedup seam lesson, one level up).
        val seam = decontaminated.localCheckpoint(true)
        val sp = Dedup.leakageSafeSplit(seam, idCol, textCol,
            cfg.splitBuckets, cfg.shingleN, j)
          .select(col(idCol), col("split_bucket"))
        seam.join(sp, Seq(idCol))
      case None =>
        Relational.withHashSplit(decontaminated, col(idCol),
          cfg.splitBuckets)
    }
  }

  final case class AssemblyConfig(
      prepare: Config = Config(),
      stratumCol: String = "source",
      alpha: Double = 0.3,
      targetFrac: Double = 1.0,
      budgetTokens: Long = Long.MaxValue,
      nShards: Int = 64)

  /** The full training-set assembly a pre-training data run executes,
    * composed from verified stages:
    *
    *   1. [[prepare]] — dedup, quality filter, decontaminate, split
    *   2. [[Mixing.temperatureResample]] — p^alpha domain re-balance
    *   3. [[Mixing.tokenBudgetSelect]] — best docs under token budget
    *   4. [[Mixing.shuffleShards]] — deterministic training order
    *
    * Returns the selected docs with (`quality`, `n_tokens`, `shard`,
    * `pos`). Determinism end to end: every stage is keyed on md5(id) or
    * exact values — two runs (or two engines) produce the identical
    * training set in the identical shard order. Scale posture is the
    * stages' own: nothing here adds a shuffle beyond theirs.
    *
    * Lifecycle: the checkpoint blocks backing the stage boundaries live
    * until the returned frame's RDDs are garbage-collected (Spark's
    * ContextCleaner); a long-lived driver assembling many corpora
    * should drop references promptly or write each assembly to its
    * durable sink and discard the frame. */
  def assembleTrainingSet(docs: DataFrame, idCol: String, textCol: String,
      evalSet: Option[DataFrame] = None,
      cfg: AssemblyConfig = AssemblyConfig()): DataFrame = {
    // stage boundaries are localCheckpoints, not persists: every stage
    // references its input 2-5x (rates+join, histogram+branches, ...),
    // so composing the lineage multiplies the logical tree per branch —
    // the assembly becomes one mega-plan that recomputes dedup/LM per
    // branch and whose very plan STRING is heap-sized. Checkpointing
    // truncates the plan to the materialized blocks, which is what a
    // production multi-stage driver does between phases anyway (the
    // durable variant being a parquet write per medallion layer).
    val prepared =
      prepare(docs, idCol, textCol, evalSet, cfg.prepare).localCheckpoint()
    val mixed = Mixing.temperatureResample(
      prepared, cfg.stratumCol, col(idCol), cfg.alpha, cfg.targetFrac)
      .localCheckpoint()
    val selected = Mixing
      .tokenBudgetSelect(mixed, textCol, idCol, cfg.budgetTokens)
      .select(col("doc_id").as("__sel_id"), col("n_tokens"))
    val kept = mixed.join(selected, col(idCol) === col("__sel_id"))
      .drop("__sel_id")
    Mixing.shuffleShards(kept, col(idCol), cfg.nShards)
  }
}
