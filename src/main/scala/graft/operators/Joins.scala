package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Join operators beyond plain equi-joins (SURVEY.md §2.3 notes the
  * reference surface is J1–J5; as-of and range joins are engine
  * extensions the training-data/timeseries side needs).
  */
object Joins {

  /** As-of join: for each left row, attach the columns of the most
    * recent right row with `rightTime <= leftTime`, matching on `keys`.
    * Left rows with no earlier right row are dropped (inner as-of).
    *
    * Implementation is the union-timeline construction, NOT a
    * theta-join: both sides are tagged and unioned, shuffled ONCE by
    * key, sorted by (time, side) within partitions, and the right-side
    * values are carried forward with `last(_, ignoreNulls)` over the
    * ordered window. Cost is one shuffle + one sort over |L|+|R| —
    * versus the |L|x|R|-per-key blowup of the naive range-join +
    * row_number form. Right rows at exactly leftTime sort BEFORE left
    * rows (<= semantics).
    *
    * Right side must be unique per (keys, rightTime) for deterministic
    * output — pre-dedup with [[Relational.dedupKeyed]] otherwise.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val rightVals = right.columns.filterNot(c =>
      keys.contains(c) || c == rightTime)
    val timeType = right.schema(rightTime).dataType
    // The whole right row travels as ONE struct (match time + value
    // columns) so every attached column comes from the same matched
    // right row — per-column last(_, ignoreNulls) would skip over a
    // null value column and mix columns of different right rows.
    val rowType = StructType(
      StructField("__rt", timeType) +:
      rightVals.map(c => StructField(c, right.schema(c).dataType)))
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__rrow", lit(null).cast(rowType))
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__rrow", struct(
        (col(rightTime).as("__rt") +: rightVals.toIndexedSeq.map(col)): _*))
    val lCols = left.columns.toIndexedSeq.map(col) ++
      Seq(col("__t"), col("__side"), col("__rrow"))
    val rCols = left.columns.toIndexedSeq.map(c =>
      if (keys.contains(c)) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) ++
      Seq(col("__t"), col("__side"), col("__rrow"))
    val unioned = lTagged.select(lCols: _*)
      .unionByName(rTagged.select(rCols: _*))
    // right rows (side 0) sort before left rows (side 1) at equal
    // timestamps => <= semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__m", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightVals.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Range join: pair rows where `leftPoint` falls inside the right
    * side's [lo, hi) interval, matching on keys.
    *
    * Planned as a GRID-BUCKETED equi-join: points and interval
    * endpoints are floored to a common grid of `gridSeconds`-wide cells
    * (micros for timestamps, the column's own unit for numerics), the
    * interval side is exploded over the cells it overlaps, and the join
    * runs on (keys..., cell) with the exact range test as the residual
    * predicate. A point lies in exactly ONE cell, so every qualifying
    * (point, interval) pair matches exactly once — no dedup pass. This
    * bounds per-task fan-out by per-(key, cell) occupancy instead of
    * per-key occupancy: a hot key (one user with millions of rows)
    * spreads across cells instead of collapsing onto one reducer —
    * the join keeps data-scaled parallelism even with FEW distinct
    * keys. Interval-side row inflation is len/gridSeconds + 1 cells
    * per interval; pick the grid near the typical interval length.
    *
    * `keys` may be empty (pure interval containment): the cell id alone
    * is the join key — the naive form would be a cross join.
    *
    * Intervals spanning more than `maxCellsPerInterval` cells (e.g. an
    * SCD-style open-ended row with a 9999-12-31 sentinel `hi`, which
    * would otherwise demand a billions-long `sequence` and kill the
    * task) skip the grid and take a BROADCAST fallback join (on the
    * keys, or a broadcast cross join when `keys` is empty). Such rows
    * are expected RARE — sentinel open-ended validity rows, one per
    * entity at most — which is what makes the broadcast safe, and when
    * there are none AQE's empty-relation propagation collapses the
    * fallback branch without scanning the point side twice. A corpus
    * where LONG intervals are the bulk needs a different operator
    * shape (overlap join), not this fallback.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftPoint: String, lo: String, hi: String,
      gridSeconds: Double = 3600.0,
      maxCellsPerInterval: Int = 4096): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    require(gridSeconds > 0, "gridSeconds must be positive")
    require(maxCellsPerInterval > 0, "maxCellsPerInterval must be positive")
    // TIMESTAMP and TIMESTAMP_NTZ both bucket on epoch micros (NTZ wall
    // time reads as session-tz instants — the same conversion on both
    // sides of the join, so cells stay consistent); parquet readers
    // hand back either depending on the writer's isAdjustedToUTC flag
    val isTs = left.schema(leftPoint).dataType match {
      case TimestampType | TimestampNTZType => true
      case _ => false
    }
    // one grid for both sides; timestamps bucket on epoch micros
    def cellOf(c: Column): Column =
      if (isTs) floor(unix_micros(c.cast(TimestampType)) / lit(gridSeconds * 1e6))
      else floor(c.cast("double") / lit(gridSeconds))
    val residual = col(leftPoint) >= col(lo) && col(leftPoint) < col(hi)
    val rValid = right.filter(col(hi) > col(lo))
      .withColumn("__ncells", cellOf(col(hi)) - cellOf(col(lo)) + 1)
    val l = left.withColumn("__cell", cellOf(col(leftPoint)))
    // include hi's cell unconditionally (empty-overlap cells only add
    // candidates that the residual predicate drops — simpler than the
    // exclusive-bound epsilon dance, and off by at most one cell)
    val rShort = rValid.filter(col("__ncells") <= maxCellsPerInterval)
      .withColumn("__cell",
        explode(sequence(cellOf(col(lo)), cellOf(col(hi)))))
      .drop("__ncells")
    val gridded = l.join(rShort, keys :+ "__cell")
      .filter(residual)
      .drop("__cell")
    val rLong = rValid.filter(col("__ncells") > maxCellsPerInterval)
      .drop("__ncells")
    val longJoined =
      (if (keys.nonEmpty) left.join(broadcast(rLong), keys)
       else left.crossJoin(broadcast(rLong)))
        .filter(residual)
    gridded.unionByName(longJoined)
  }

  /** Skew-salted equi-join: the hot-key mitigation for shuffles AQE
    * cannot re-plan (stream-static joins, or when one key holds >1
    * executor's worth of rows even after AQE's partition splitting).
    * The BIG side's key is widened with a per-row salt in [0, salts);
    * the SMALL side is replicated `salts` times so every (key, salt)
    * cell still finds its match — one hot key now spreads across
    * `salts` reducers instead of melting one. Output == the plain
    * equi-join row-for-row (JoinsSpec asserts it on a skewed
    * fixture); cost = `salts`x the small side's shuffle volume, which
    * is the explicit trade (use for genuinely skewed keys, not as a
    * default — unskewed joins should let AQE work).
    *
    * The default salt is `monotonically_increasing_id % salts` —
    * deterministic for a fixed partition layout, and the OUTPUT is
    * layout-invariant regardless (the join result does not depend on
    * which salt cell a row lands in). Pass `saltSource` (any per-row
    * attribute that varies WITHIN a key — a row id, a timestamp) to
    * derive the salt as `pmod(hash(saltSource), salts)` instead, which
    * is stable across reruns and resumed stages independent of layout;
    * a key-constant source degenerates to no spreading. Only
    * inner/left joins are offered: right/outer over a replicated side
    * would need match-dedup bookkeeping that belongs in a different
    * operator. (Single implementation — `etl.Layout.saltedJoin`
    * delegates here.) */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner",
      saltSource: Option[Column] = None): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer",
      s"saltedJoin supports inner/left joins, got $joinType")
    val saltExpr = saltSource
      .map(src => pmod(hash(src), lit(salts)).cast("long"))
      .getOrElse(pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val b = big.withColumn("__salt", saltExpr)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Blocked fuzzy self-join: (id, id, dist) pairs whose `prefixLen`-
    * char prefixes sit within `maxDist` Levenshtein edits — the
    * edit-distance rung of the near-dup ladder (catches the
    * char-level typo/OCR variants token shingles smear out). Candidate
    * generation is an EQUI-join on (first `blockLen` chars, length
    * band), so the quadratic Levenshtein kernel only runs inside
    * blocks — the standard blocking trade: a pair edited within its
    * first `blockLen` chars or straddling a length band is missed, by
    * contract (tune blockLen down / lenBand up for recall, at
    * block-occupancy cost). Keep prefixLen bounded: Levenshtein is
    * O(prefixLen²) per pair and full-text distance at corpus scale is
    * exactly the trap the prefix avoids.
    *
    * Scale shape: one hash exchange on the (block, band) key carrying
    * id + prefix only (never full text); per-block fan-out is bounded
    * by block occupancy, same posture as [[rangeJoin]]'s grid cells. */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
      blockLen: Int = 6, prefixLen: Int = 40, maxDist: Int = 5,
      lenBand: Int = 16): DataFrame = {
    require(blockLen > 0 && prefixLen >= blockLen && maxDist >= 0 &&
      lenBand > 0)
    val base = df.select(col(idCol).as("__id"),
      substring(col(strCol), 1, prefixLen).as("__pfx"),
      substring(col(strCol), 1, blockLen).as("__blk"),
      floor(length(col(strCol)) / lenBand).as("__lb"))
    val a = base.select(col("__id").as("a_id"), col("__pfx").as("__apfx"),
      col("__blk"), col("__lb"))
    val b = base.select(col("__id").as("b_id"), col("__pfx").as("__bpfx"),
      col("__blk"), col("__lb"))
    a.join(b, Seq("__blk", "__lb"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist", levenshtein(col("__apfx"), col("__bpfx")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** Join-cardinality preflight: the EXACT output row count of
    * `left ⋈ right` on an equality key, WITHOUT materializing the
    * join — Σ_k cntL(k)·cntR(k) over the per-key count frames.
    *
    * The guard you run before a join you suspect of blowup at 100 TB:
    * each side collapses to one row per distinct key via a map-side-
    * combined count, the key-sized frames equi-join, and one product
    * sum comes back. Cost is bounded by DISTINCT-KEY cardinality —
    * the fact rows never cross an exchange — so a join that would
    * produce 10^13 rows is diagnosed for the price of two counts.
    * Output: 1 row, `join_rows` (long). */
  def joinCardinality(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column): DataFrame = {
    val lc = left.groupBy(leftKey.as("__k")).agg(count(lit(1)).as("__lc"))
    val rc = right.groupBy(rightKey.as("__k")).agg(count(lit(1)).as("__rc"))
    lc.join(rc, "__k")
      .agg(coalesce(sum(col("__lc") * col("__rc")), lit(0L)).as("join_rows"))
  }

  /** [[joinCardinality]]'s culprit report: the `k` keys contributing
    * the most output rows to the join, with both sides' multiplicities
    * — the actionable half of the preflight (these are the keys to
    * salt, filter, or pre-aggregate). Same key-sized cost shape; the
    * top-k rides TakeOrderedAndProject, ties break on the key. */
  def joinBlowupKeys(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val lc = left.groupBy(leftKey.as("__k")).agg(count(lit(1)).as("left_rows"))
    val rc = right.groupBy(rightKey.as("__k")).agg(count(lit(1)).as("right_rows"))
    lc.join(rc, "__k")
      .select(col("__k").as("key"), col("left_rows"), col("right_rows"),
        (col("left_rows") * col("right_rows")).as("out_rows"))
      .orderBy(col("out_rows").desc, col("key"))
      .limit(k)
  }

  /** FIFO lot matching — the inventory/cost-allocation join: consume
    * supply lots in arrival order against demands in request order
    * (first-in-first-out), emitting how much of each demand each lot
    * fills. The classic sequential-scan problem turned RELATIONAL: a
    * lot occupies the cumulative-quantity interval
    * [cum_before, cum_after) on its key's supply axis, a demand
    * occupies the same on the demand axis, and FIFO matching is
    * EXACTLY the overlap of those intervals — no per-key loop, no
    * state machine, just two prefix-sum windows and one equi-join on
    * the key with an overlap filter.
    *
    * Scale shape: per-key windows run in parallel after one hash
    * exchange per side; the key join's candidate fan-out is
    * n_supply·n_demand per key — fine for the catalog-shaped keys this
    * serves (lots per SKU), and a pathologically deep key can bucket
    * the cumulative axis with [[intervalOverlapJoin]]'s grid. Output:
    * key, both id columns, matched_qty (> 0 rows only). Quantities
    * must be non-negative; order is (orderCol, idCol) per side.
    *
    * Precision: the cumulative axes accumulate as DOUBLE, so the
    * zero-overlap boundary (`matched_qty > 0` after a 6-digit round)
    * is exact for INTEGRAL quantities (every prefix sum below 2^53 is
    * representable) — the TPC-H fixture's regime. Fractional
    * quantities with deep per-key prefix sums can land an overlap
    * within an ulp of zero and diverge from an exact-decimal engine
    * at that boundary; feed scaled-integer quantities (cents, mils)
    * if that matters. */
  def fifoMatch(supply: DataFrame, demand: DataFrame, key: String,
      supplyId: String, demandId: String, qtyS: String, qtyD: String,
      orderS: Seq[Column], orderD: Seq[Column],
      scale: Int = 6): DataFrame = {
    def cum(df: DataFrame, id: String, qty: String, ord: Seq[Column],
        tag: String): DataFrame = {
      val w = Window.partitionBy(col(key)).orderBy(ord :+ col(id): _*)
      val q = col(qty).cast("double")
      val checked = when(q >= 0.0, q).otherwise(raise_error(concat(
        lit("fifoMatch: negative quantity: "), q.cast("string"))))
      df.withColumn("__q", checked)
        .withColumn(s"${tag}_hi", sum(col("__q")).over(w))
        .withColumn(s"${tag}_lo", col(s"${tag}_hi") - col("__q"))
        .select(col(key), col(id), col(s"${tag}_lo"), col(s"${tag}_hi"))
    }
    val s = cum(supply, supplyId, qtyS, orderS, "s")
    val d = cum(demand, demandId, qtyD, orderD, "d")
    s.join(d, Seq(key))
      .filter(col("s_lo") < col("d_hi") && col("d_lo") < col("s_hi"))
      .select(col(key), col(supplyId), col(demandId),
        round(least(col("s_hi"), col("d_hi")) -
          greatest(col("s_lo"), col("d_lo")), scale).as("matched_qty"))
      .filter(col("matched_qty") > 0.0)
  }

  /** Interval OVERLAP join: all (a, b) pairs whose closed integer
    * intervals [startA, endA] x [startB, endB] intersect — the
    * interval-x-interval sibling of [[rangeJoin]]'s point-in-interval
    * (maintenance windows x order windows, session x campaign flight,
    * shift x incident). No cross join: both sides explode onto the
    * fixed `cellWidth` grid of cells they COVER (sequence of cell
    * ids — interval-length-bounded, so pick cellWidth near the
    * typical interval length to keep the fan-out ~1-2 rows), the
    * candidate join is a hash EQUI-join on the cell id, and the exact
    * overlap predicate filters candidates.
    *
    * An overlapping pair co-occurs in EVERY cell both intervals
    * cover — deduplicated structurally (no distinct): the pair is
    * kept only in its OWNER cell, the one containing max(startA,
    * startB), which both sides cover exactly when they overlap.
    *
    * Invalid intervals (start > end) fail loudly rather than silently
    * dropping rows. Output: all columns of both sides + `overlap` =
    * min(endA, endB) - max(startA, startB) + 1 (closed-interval
    * units). */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
      startA: String, endA: String, startB: String, endB: String,
      cellWidth: Long): DataFrame = {
    require(cellWidth > 0, "cellWidth must be positive")
    def cells(df: DataFrame, s: String, e: String): DataFrame = {
      val checked = when(col(s) <= col(e), col(s)).otherwise(
        raise_error(concat(lit("intervalOverlapJoin: start > end: "),
          col(s).cast("string"), lit(" > "), col(e).cast("string"))))
      df.withColumn(s, checked)
        .withColumn("__cell", explode(sequence(
          floor(col(s) / cellWidth), floor(col(e) / cellWidth))))
    }
    val owner = floor(greatest(col(startA), col(startB)) / cellWidth)
    cells(a, startA, endA).join(cells(b, startB, endB), Seq("__cell"))
      .filter(col(startA) <= col(endB) && col(startB) <= col(endA))
      .filter(col("__cell") === owner)
      .withColumn("overlap",
        least(col(endA), col(endB)) - greatest(col(startA), col(startB))
          + lit(1L))
      .drop("__cell")
  }
}
