package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Projection / filter / dedup / set operators from SURVEY.md §2.2, §2.4
  * (A7), §2.6, §2.7. Each is a small `DataFrame => DataFrame` combinator so
  * Catalyst sees one declarative plan end-to-end (pushdown + pruning stay
  * free; nothing here materializes or collects).
  */
object Relational {

  /** A7 — exact deduplication on a projected key set.
    * Reference: `Deliverable_3/load_to_silver_layer.py:45,121`
    * (`dropDuplicates`). We expose the deterministic `distinct` form for
    * oracle-comparable results; `dropDuplicates` keeps an arbitrary winner.
    * Scale note: distinct on (k1..kn) is a hash aggregate with map-side
    * partial dedup — shuffle volume is already-deduped keys, not raw rows.
    */
  def dedupExact(cols: Seq[String])(df: DataFrame): DataFrame =
    df.select(cols.map(col): _*).distinct()

  /** A7 (keyed, deterministic winner) — keep exactly one row per key,
    * choosing the minimum by `order` (vs the reference's nondeterministic
    * first-wins `dropDuplicates`). row_number + filter = single shuffle on
    * the key; at 100 TB prefer this over `groupBy(keys).agg(min_by(...))`
    * when you need the *whole* winning row.
    */
  def dedupKeyed(keys: Seq[String], order: Seq[Column])(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** P7 — sentinel repair: conditional projection replacing a sentinel
    * value with a fallback expression.
    * Reference: `Deliverable_3/NEW_train_offset_3_10min_ETH.py:113-115`
    * (`when(price == -1, (bid+ask)/2).otherwise(price)`).
    */
  def repairSentinel(target: String, isSentinel: Column, fallback: Column)(
      df: DataFrame): DataFrame =
    df.withColumn(target, when(isSentinel, fallback).otherwise(col(target)))

  /** P8 — null-count profile: one row, one column per input column holding
    * `count(*) - count(col)`.
    * Reference: `Deliverable_3/NOTEBOOKS/EDA_silver.ipynb` cell 8
    * (per-column `count(col(c)) - df.count()`); the reference runs one job
    * per column — we compute all columns in a single aggregate pass.
    */
  def nullProfile(df: DataFrame): DataFrame = {
    val aggs = df.columns.toIndexedSeq.map(c => (count(lit(1)) - count(col(c))).as(c))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Schema-wide column profile: one row per column with its null and
    * distinct counts — [[nullProfile]]'s long-form sibling and the
    * first query run against any unfamiliar table. ONE aggregate pass;
    * with `exact=true` Spark expands the input once per distinct
    * column (the multi-distinct Expand plan — fine for oracle duty),
    * with `exact=false` the distincts become mergeable HLL++ sketches
    * and the pass stays single-width (the 100 TB default). */
  def profileColumns(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
      (if (exact) countDistinct(col(c))
       else approx_count_distinct(col(c))).as(s"__d_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c => s"'$c', __n_$c, __d_$c").mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stacked) AS (col_name, n_nulls, n_distinct)")
  }

  /** U1 — n-way union by name (the reference unions by position:
    * `load_to_silver_layer.py:120`; by-name is the safe generalization).
    */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_ unionByName _)

  /** Set intersection (distinct) by NAME — `b`'s columns are reordered
    * to `a`'s schema first, the same by-name safety rule as
    * [[unionAll]]. Catalyst plans this as a left-semi hash join over
    * distinct rows: one shuffle per side keyed by the full row, with
    * map-side partial dedup — no sort, broadcastable when one side's
    * distinct set is small. */
  def intersectDistinct(a: DataFrame, b: DataFrame): DataFrame =
    a.intersect(b.select(a.columns.toIndexedSeq.map(col): _*))

  /** Set difference (distinct) by NAME: rows of `a` not present in
    * `b`. Left-anti hash join over distinct rows, same shuffle shape
    * as [[intersectDistinct]]. */
  def exceptDistinct(a: DataFrame, b: DataFrame): DataFrame =
    a.except(b.select(a.columns.toIndexedSeq.map(col): _*))

  /** O1/O2 — deterministic top-k: order by `measures` then `tieBreak`
    * (a unique key) so the k-set is stable. Reference:
    * `EDA_silver.ipynb` cell 9 (`orderBy(count desc).head(10)`).
    * Scale note: Spark plans orderBy+limit as TakeOrderedAndProject —
    * per-partition top-k then a k-row merge on the driver, no full sort.
    */
  def topK(k: Int, measures: Seq[Column], tieBreak: Seq[Column])(
      df: DataFrame): DataFrame =
    df.orderBy(measures ++ tieBreak: _*).limit(k)

  /** Top-N-plus-Other rollup — the reporting twin of a plain per-group
    * top-k: keep each group's n highest-measure keys and LUMP THE REST
    * into a single `otherLabel` row per group, so group totals are
    * preserved (a bare top-k silently drops the tail; dashboards need
    * "top 5 + Other = 100%"). Ranking is (summed measure desc, key
    * asc) — deterministic under ties.
    *
    * Scale shape: one (group, key) hash aggregate, a per-group window
    * rank over the AGGREGATED frame (key-cardinality-sized, not
    * row-sized), then a second group-sized aggregate for the Other
    * bucket. Output: (groupCol, keyCol, measure, is_other). */
  def topNOther(df: DataFrame, groupCol: String, keyCol: String,
      measure: Column, n: Int, otherLabel: String = "__other__"): DataFrame = {
    require(n >= 1)
    import org.apache.spark.sql.expressions.Window
    val agg = df.groupBy(col(groupCol), col(keyCol).cast("string").as(keyCol))
      .agg(measure.as("measure"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("measure").desc, col(keyCol))
    val ranked = agg.withColumn("__rn", row_number().over(w))
    val top = ranked.filter(col("__rn") <= n)
      .select(col(groupCol), col(keyCol), col("measure"),
        lit(false).as("is_other"))
    val other = ranked.filter(col("__rn") > n)
      .groupBy(col(groupCol))
      .agg(sum(col("measure")).as("measure"))
      .select(col(groupCol), lit(otherLabel).as(keyCol), col("measure"),
        lit(true).as("is_other"))
    top.unionByName(other)
  }

  /** J5 + J3 — dimension-grid gap fill: cross product of the distinct
    * values of two dimension frames, left-joined with the fact aggregate,
    * missing measures coalesced to a default.
    * Reference: `Deliverable_3/NOTEBOOKS/stream_eda.ipynb:758-769`
    * (`MultiIndex.from_product` + left `merge`).
    * Scale note: the grid is dims-only (tiny) — build it with a broadcast
    * cross join, then ONE shuffle joins facts; never cross-join facts.
    */
  def gridFill(
      dimA: DataFrame, dimB: DataFrame, agg: DataFrame,
      keys: Seq[String], fills: Map[String, Column])(implicit d: DummyImplicit): DataFrame = {
    val grid = broadcast(dimA).crossJoin(broadcast(dimB))
    val joined = grid.join(agg, keys, "left")
    fills.foldLeft(joined) { case (acc, (c, dflt)) =>
      acc.withColumn(c, coalesce(col(c), dflt))
    }
  }

  /** J4 — full-outer join + coalesce of the overlapping measure.
    * Reference: `stream_eda.ipynb:1617-1624` (outer merge) + `:1881`
    * (bfill-as-coalesce).
    */
  def fullOuterCoalesce(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      coalesced: Map[String, (String, String)])(implicit d: DummyImplicit): DataFrame = {
    val joined = left.join(right, keys, "full_outer")
    coalesced.foldLeft(joined) { case (acc, (out, (a, b))) =>
      acc.withColumn(out, coalesce(col(a), col(b)))
    }
  }

  /** W2 — per-key linear interpolation of nulls over an ordered numeric
    * axis. Reference: `stream_eda.ipynb:769,1394`
    * (`groupby('symbol').apply(interpolate)` in pandas).
    *
    * Composite of four window scans (prev/next value and axis position),
    * then a linear blend — stays entirely in whole-stage codegen, one
    * shuffle on the partition key. Rows outside any bracket (leading /
    * trailing nulls) keep null, matching pandas `interpolate()` default
    * (which forward-fills trailing but not leading; we keep BOTH null and
    * document the divergence — trailing extrapolation is rarely wanted).
    */
  def interpolateLinear(partitionBy: Seq[String], orderBy: String, value: String)(
      df: DataFrame): DataFrame = {
    val pk = partitionBy.map(col)
    val asc = Window.partitionBy(pk: _*).orderBy(col(orderBy))
      .rowsBetween(Window.unboundedPreceding, 0)
    val desc = Window.partitionBy(pk: _*).orderBy(col(orderBy).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val v = col(value)
    val x = col(orderBy).cast("double")
    val prevV = last(when(v.isNotNull, v), ignoreNulls = true).over(asc)
    val prevX = last(when(v.isNotNull, x), ignoreNulls = true).over(asc)
    val nextV = last(when(v.isNotNull, v), ignoreNulls = true).over(desc)
    val nextX = last(when(v.isNotNull, x), ignoreNulls = true).over(desc)
    df.withColumn("__pv", prevV).withColumn("__px", prevX)
      .withColumn("__nv", nextV).withColumn("__nx", nextX)
      .withColumn(value,
        when(v.isNotNull, v)
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            when(col("__nx") === col("__px"), col("__pv")).otherwise(
              col("__pv") + (col("__nv") - col("__pv")) *
                (x - col("__px")) / (col("__nx") - col("__px"))))
          .otherwise(lit(null)))
      .drop("__pv", "__px", "__nv", "__nx")
  }

  /** Deterministic hash split: assign each row a stable bucket in
    * [0, buckets) from the md5 of its key — the reproducible
    * train/val/test split for dataset pipelines. Unlike rand(seed)
    * (whose assignment depends on partitioning and row order), the
    * bucket is a pure function of the key: any engine, any run, any
    * partitioning reproduces it, and late-arriving rows land in the
    * same split as their key. */
  def withHashSplit(df: DataFrame, key: Column, buckets: Int,
      splitCol: String = "split_bucket"): DataFrame =
    df.withColumn(splitCol,
      conv(substring(md5(key.cast("string")), 1, 6), 16, 10)
        .cast("long") % buckets)

  /** Deterministic sampling: keep ~`fraction` of rows, selected by the
    * md5 hash of `key` (key-stable: all rows of a key are kept or
    * dropped together, the same rows every run on every engine —
    * unlike `df.sample`, whose output depends on partitioning). The
    * right shape for reproducible dataset downsampling and for
    * consistent user/session-level sampling across tables that share
    * the key. */
  def deterministicSample(df: DataFrame, key: Column,
      fraction: Double, buckets: Int = 1000): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    val keep = math.round(fraction * buckets)
    withHashSplit(df, key, buckets, "__bucket")
      .filter(col("__bucket") < keep)
      .drop("__bucket")
  }

  /** Stratified deterministic sampling: a per-stratum keep rate over
    * the same md5 key-bucket mechanism as [[deterministicSample]] —
    * the data-mixing primitive of a training pipeline (downsample
    * over-represented languages/domains, keep the tail whole). Rows
    * whose stratum is absent from `rates` keep `defaultRate`.
    * Key-stable and engine/partitioning-independent; the rate lookup
    * is a codegen'd CASE chain, so the whole operator stays a pure
    * map-side projection + filter (no shuffle, no sampling state). */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      buckets: Int = 1000): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0,1]")
    val keep = rates.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultRate * buckets)): Column) {
      case (els, (s, r)) =>
        when(strata === s, lit(math.round(r * buckets))).otherwise(els)
    }
    withHashSplit(df, key, buckets, "__bucket")
      .filter(col("__bucket") < keep)
      .drop("__bucket")
  }

  /** Dataset version diff: per-id status between two corpus snapshots —
    * `added` (only in `b`), `removed` (only in `a`), `changed` (both,
    * content fingerprint differs), `unchanged`. The audit primitive for
    * corpus versioning: what moved between two releases, cheap enough
    * to run per release. One equi-join of (id, 16-byte fingerprint)
    * projections — document text never shuffles. */
  def datasetDiff(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val fa = a.select(col(idCol).as("id"),
      graft.functions.Text.fingerprint(col(textCol)).as("__fa"))
    val fb = b.select(col(idCol).as("id"),
      graft.functions.Text.fingerprint(col(textCol)).as("__fb"))
    fa.join(fb, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("__fa").isNull, "added")
          .when(col("__fb").isNull, "removed")
          .when(col("__fa") === col("__fb"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Deterministic EXACT-size sample: the k rows whose salted md5 hash
    * is smallest (ties broken by the hash's own key, so the selection
    * is a total order). The fixed-count companion to
    * [[deterministicSample]]'s fixed-fraction: any engine, run, or
    * partitioning picks the same k rows, and late-arriving data only
    * changes the selection where a new key hashes under the cut.
    * Plans as TakeOrderedAndProject — per-partition bounded heaps,
    * never a global sort (the same reason top-k is scalable).
    * Keys must be non-null: a null key yields a null hash, and engines
    * disagree on where nulls sort — the selection would not be
    * portable. */
  def deterministicTake(df: DataFrame, key: Column, k: Int,
      salt: String = "take"): DataFrame = {
    require(k >= 0)
    df.withColumn("__h", md5(concat(key.cast("string"), lit(":" + salt))))
      .orderBy(col("__h"), key)
      .limit(k)
      .drop("__h")
  }

  /** Deterministic per-stratum EXACT-k take: within every stratum, the
    * k rows with the smallest salted md5 hash (key tiebreak — a total
    * order). The balanced-subset primitive: equal-sized per-language /
    * per-domain samples for evals, probes and human review, stable
    * across engines, runs and partitionings. Strata with fewer than k
    * rows keep everything (no padding).
    *
    * Scale shape: one hash-partitioned exchange on the stratum key,
    * then per-stratum window ranks run in parallel — the
    * [[graft.llm.Mixing.qualityPercentileFilter]] posture; one
    * pathologically hot stratum becomes a single sort partition (same
    * caveat, same histogram-bucketing escape hatch). Keys must be
    * non-null, as in [[deterministicTake]]. */
  def stratifiedTake(df: DataFrame, strata: Column, key: Column, k: Int,
      salt: String = "take"): DataFrame = {
    require(k >= 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strata).orderBy(col("__h"), key)
    df.withColumn("__h", md5(concat(key.cast("string"), lit(":" + salt))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__h", "__rn")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): every row draws u from its salted md5 hash and is
    * ranked by ln(u)/weight — the top-k by that score is a weighted
    * sample where a row's selection odds scale with its weight (the
    * quality-weighted corpus subsample: sample 1B of 10B docs
    * proportionally to quality score, reproducibly). Weights must be
    * strictly positive.
    *
    * Scale shape: one map-only score projection + TakeOrdered (per-
    * partition heaps, k rows per partition to the driver — no global
    * sort). Deterministic across runs, engines and partitionings: u is
    * the md5-prefix idiom of [[deterministicTake]], u in (0,1) from 52
    * hash bits, ties broken by key. */
  def weightedTake(df: DataFrame, key: Column, weight: Column, k: Int,
      salt: String = "wtake"): DataFrame = {
    require(k >= 0)
    df.withColumn("__ws", esScore(key, weight, salt))
      .orderBy(col("__ws").desc, key)
      .limit(k)
      .drop("__ws")
  }

  /** Per-stratum weighted EXACT-k sampling without replacement: the
    * [[weightedTake]] score ranked inside each stratum — per-domain /
    * per-language quality-proportional subsamples with a hard per-cell
    * budget (the corpus-mixing sampler: "200k docs per language,
    * preferring high quality"). Strata with fewer than k rows keep
    * everything. Same scale posture as [[stratifiedTake]]: one hash
    * exchange on the stratum key, parallel per-stratum window ranks. */
  def stratifiedWeightedTake(df: DataFrame, strata: Column, key: Column,
      weight: Column, k: Int, salt: String = "wtake"): DataFrame = {
    require(k >= 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strata).orderBy(col("__ws").desc, key)
    df.withColumn("__ws", esScore(key, weight, salt))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__ws", "__rn")
  }

  /** The Efraimidis-Spirakis ranking score ln(u)/w with u drawn from
    * the salted-md5 idiom — shared by the global and stratified
    * weighted takes so their samples agree where strata don't bind. */
  private def esScore(key: Column, weight: Column, salt: String): Column = {
    val u = (conv(substring(
        md5(concat(key.cast("string"), lit(":" + salt))), 1, 13), 16, 10)
      .cast("double") + lit(1.0)) / lit(math.pow(2, 52) + 2.0)
    // weights must be strictly positive: w<0 flips ln(u)/w positive so
    // the row ALWAYS wins, w=0 yields -Inf silently — fail loudly
    // instead of biasing the sample
    val w = weight.cast("double")
    val wChecked = when(w > 0.0, w).otherwise(raise_error(concat(
      lit("esScore: weight must be strictly positive, got "),
      coalesce(w.cast("string"), lit("null")))))
    log(u) / wChecked
  }
}
