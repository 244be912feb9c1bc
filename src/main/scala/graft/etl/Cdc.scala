package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: turning per-key event/attribute streams
  * into slowly-changing-dimension history — the lakehouse silver→gold
  * step a warehouse MERGE would run, expressed as pure DataFrame ops so
  * it plans as ordinary windows + aggregates.
  */
object Cdc {

  /** SCD2 historization: collapse a per-key, time-ordered attribute
    * stream into validity intervals — one row per RUN of identical
    * attribute values, with `valid_from` (first observation),
    * `valid_to` (start of the next run, null while current),
    * `is_current`, and the observation count. Re-observations of the
    * SAME values open a new interval only after an intervening change
    * (true run-length semantics, not a distinct on values).
    *
    * Scale shape: ONE exchange total (plan-audited). The run id is a
    * change-flag running sum over a key-partitioned window (null-safe
    * `<=>` against the lag, so a null attribute is a value, not a
    * wildcard); the per-run collapse groups on (key, run, attrs) and
    * the `valid_to` stitch windows on key — both REUSE the first
    * window's hash partitioning (their keys contain it), so only
    * in-partition sorts follow. The exchange carries (key, order,
    * attrs) only. `tieBreak` makes within-timestamp order
    * deterministic. */
  def scd2(df: DataFrame, key: String, ts: String, attrs: Seq[String],
      tieBreak: Seq[Column] = Nil): DataFrame =
    collapse(df.select(col(key) +: col(ts) +:
        (attrs.map(col) ++ tieBreak :+ lit(1L).as("__w")): _*),
      key, ts, attrs, tieBreak)

  /** Incremental SCD2 MERGE: fold a batch of new observations into an
    * existing [[scd2]] history without touching unaffected keys — the
    * per-trigger CDC upsert. History rows of the touched keys are
    * replayed as weighted pseudo-observations (valid_from carries the
    * run, n_obs carries its weight), unioned with the fresh rows and
    * re-collapsed; a batch row that continues a key's current run
    * extends it (n_obs grows, valid_from survives) rather than opening
    * a duplicate interval.
    *
    * Contract: batch observations must not predate the key's recorded
    * history (the run structure of the original observations inside a
    * closed interval is no longer recoverable) — the standard
    * append-in-time CDC assumption. Under it the result row-equals a
    * full recompute over all observations (spec-enforced).
    *
    * Scale shape: the window/collapse work is bounded by the TOUCHED
    * keys' history + batch (batch-sized, not corpus-sized); untouched
    * history passes through a single anti join unchanged. */
  def scd2Merge(history: DataFrame, updates: DataFrame, key: String,
      ts: String, attrs: Seq[String]): DataFrame = {
    val touched = updates.select(col(key)).distinct()
    val touchedHist = history.join(touched, Seq(key), "left_semi")
    val untouched = history.join(touched, Seq(key), "left_anti")
    val pseudo = touchedHist.select(col(key) +:
      col("valid_from").as(ts) +:
      (attrs.map(col) :+ col("n_obs").as("__w")): _*)
    val fresh = updates.select(col(key) +: col(ts) +:
      (attrs.map(col) :+ lit(1L).as("__w")): _*)
    val rebuilt = collapse(pseudo.unionByName(fresh), key, ts, attrs, Nil)
    untouched.unionByName(rebuilt)
  }

  /** Incremental aggregate maintenance: fold a new batch into an
    * existing pre-aggregated gold table WITHOUT rescanning history —
    * the materialized-view refresh every medallion pipeline runs per
    * trigger. Works for the MERGEABLE aggregate algebra (count, sum,
    * min, max — and means as sum/count downstream); a non-mergeable
    * aggregate (exact median, distinct) needs either a sketch
    * (HLL/quantile) or a recompute, by design.
    *
    * `gold` and `batchAgg` must share the schema: `keys` plus the
    * aggregate columns named in `sumCols`/`minCols`/`maxCols` (counts
    * are sums of counts — list them in `sumCols`). Result row-equals
    * the full recompute over (history ∪ batch) (spec-enforced).
    *
    * Scale shape: one unionByName + one grouped fold over the
    * KEY-CARDINALITY-sized frames — the raw history never appears.
    * The batch side is batch-sized; the gold side is the standing
    * aggregate. */
  def mergeAggregates(gold: DataFrame, batchAgg: DataFrame,
      keys: Seq[String], sumCols: Seq[String],
      minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil): DataFrame = {
    require(sumCols.nonEmpty || minCols.nonEmpty || maxCols.nonEmpty)
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    gold.unionByName(batchAgg)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Keyed table reconciliation: diff an OLD and a NEW snapshot on a
    * key, classify every key as added / removed / changed / unchanged
    * (null-safe column compare over `compareCols`), and report the
    * count per status — the migration / CDC-replication audit run
    * after every backfill ("did the copy drift?").
    *
    * Scale shape: ONE full-outer shuffle join on the key carrying the
    * key plus only the compared columns (never whole rows), then a
    * 4-row-bounded status aggregate. Column-level drift columns
    * (which field changed how often) ride the same join via one
    * conditional-sum pass — no second scan. */
  def diffTables(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compared column")
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__o", lit(1))
      .select(keys.map(col) ++ compareCols.map(c =>
        col(c).as(s"__o_$c")) :+ col("__o"): _*)
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__n", lit(1))
      .select(keys.map(col) ++ compareCols.map(c =>
        col(c).as(s"__n_$c")) :+ col("__n"): _*)
    val joined = o.join(n, keys, "full_outer")
    val anyDiff = compareCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduce(_ || _)
    val status = when(col("__o").isNull, "added")
      .when(col("__n").isNull, "removed")
      .when(anyDiff, "changed")
      .otherwise("unchanged")
    joined.select(status.as("status") +:
      compareCols.map(c =>
        when(col("__o").isNotNull && col("__n").isNotNull &&
          !(col(s"__o_$c") <=> col(s"__n_$c")), 1L).otherwise(0L)
          .as(s"__d_$c")): _*)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        compareCols.map(c =>
          sum(col(s"__d_$c")).as(s"changed_$c")): _*)
  }

  /** Shared core: run-length collapse + validity stitch over rows
    * already projected to (key, ts, attrs, tieBreak, __w). */
  private def collapse(obs: DataFrame, key: String, ts: String,
      attrs: Seq[String], tieBreak: Seq[Column]): DataFrame = {
    require(attrs.nonEmpty, "scd2 needs at least one tracked attribute")
    val w = Window.partitionBy(col(key)).orderBy(col(ts) +: tieBreak: _*)
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val runs = obs
      .withColumn("__run", sum(when(changed, 1L).otherwise(0L)).over(w))
    val collapsed = runs
      .groupBy(col(key) +: col("__run") +: attrs.map(col): _*)
      .agg(min(col(ts)).as("valid_from"), sum(col("__w")).as("n_obs"))
    val wk = Window.partitionBy(col(key)).orderBy(col("valid_from"))
    collapsed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wk))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__run")
  }
}
