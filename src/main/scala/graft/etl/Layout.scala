package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout levers for 100 TB joins (builder prompt: "broadcast
  * for small dims, repartition/bucketing for co-located joins, salting
  * for skew").
  */
object Layout {

  /** Write a table bucketed+sorted by the join key: two tables bucketed
    * the same way join with NO exchange and NO sort at query time (the
    * shuffle is paid once at write). The layout lever for repeated
    * fact-fact joins (e.g. lineitem⋈orders at every sf).
    * Requires a session with a warehouse (any catalogImplementation —
    * bucket metadata lives in the session catalog). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  /** Salted equi-join for skewed keys: the skewed (big) side gets a
    * deterministic salt in [0, salts); the small side is replicated
    * `salts` times; the join key becomes (key, salt), splitting each hot
    * key's rows across `salts` reducers. Use when one side has hot keys
    * and broadcast is too big; AQE's skew handling covers the
    * sort-merge case, this covers aggregation-feeding joins
    * deterministically.
    *
    * Salt is pmod(hash(saltSource), salts) — deterministic, no rand():
    * reruns and resumed stages produce identical assignments. The
    * saltSource column must vary WITHIN a key (any per-row attribute —
    * a row id, a timestamp); a key-constant source degenerates to no
    * spreading.
    *
    * Thin wrapper over [[graft.operators.Joins.saltedJoin]] (the single
    * implementation — multi-key, inner/left, optional salt source);
    * kept for the layout-lever API surface alongside
    * bucketing/copartition/bloom. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, saltSource: Column): DataFrame =
    graft.operators.Joins.saltedJoin(big, small, Seq(key), salts,
      "inner", Some(saltSource))

  /** Pre-shuffle co-partitioning without a catalog: repartition both
    * sides identically by the key so the join reuses the exchange (one
    * shuffle each instead of planner-chosen re-shuffles downstream when
    * several joins/aggs share the key). */
  def copartition(dfs: Seq[DataFrame], key: String, partitions: Int): Seq[DataFrame] =
    dfs.map(_.repartition(partitions, col(key)))

  /** Bloom-filter pre-join pruning: build a bloom filter over the
    * `small` side's join key (one aggregate producing a single binary
    * blob), broadcast it, and drop `large` rows whose key cannot be in
    * `small` BEFORE the join's exchange. At 100 TB this cuts the
    * shuffled fact-side volume to ~the matching fraction (plus the
    * false-positive rate, default ~1% at 8 bits/item).
    *
    * Spark's own InjectRuntimeFilter does this automatically only
    * inside a single query when the join is shuffle-shaped; the
    * explicit form also covers multi-job pipelines (build once, prune
    * a later job's scan) and aggregation-feeding filters the optimizer
    * won't introduce. No false negatives: might_contain is a superset
    * filter, so join results are unchanged.
    *
    * expectedItems sizes the filter (numBits = 8 x expectedItems,
    * capped at 64 MiB); oversizing is cheap, undersizing raises the
    * false-positive rate but stays correct. */
  def bloomPrune(large: DataFrame, largeKey: Column,
      small: DataFrame, smallKey: Column,
      expectedItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.types.BinaryType
    val numBits = math.min(8L * expectedItems, 8L * 64 * 1024 * 1024)
    val bloomAgg = Bridge.toColumn(
      new BloomFilterAggregate(
        Bridge.toExpression(xxhash64(smallKey)),
        Literal(expectedItems),
        Literal(numBits))
        .toAggregateExpression())
    // EAGER: the bloom build runs now (one small-side aggregate job) —
    // might_contain requires a constant filter blob, and the
    // build->probe barrier is inherent to bloom pruning anyway. The
    // blob rides into executors with the task binary (capped 64 MiB).
    val bytes = small.agg(bloomAgg.as("__bf")).head().getAs[Array[Byte]](0)
    if (bytes == null) large.filter(lit(false)) // empty build side
    else large.filter(Bridge.toColumn(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      Bridge.toExpression(xxhash64(largeKey)))))
  }

  /** Morton (Z-order) value over numeric columns: each column is
    * min/max-scaled into a `bits`-bit bucket and the bucket bits are
    * interleaved, so rows close in EVERY dimension get close z-values.
    * The min/max frame rides the plan as a broadcast 1-row cross join
    * (no collect). The interleave is a fixed shiftleft/and chain —
    * whole-stage-codegen'd, no UDF. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 8,
      out: String = "__z"): DataFrame = {
    require(cols.nonEmpty && bits * cols.size <= 62,
      s"bits*dims must fit a long, got $bits x ${cols.size}")
    val (withStats, buckets) = bucketed(df, cols, bits)
    val z = (0 until bits).flatMap { b =>
      buckets.zipWithIndex.map { case (bk, i) =>
        shiftleft(shiftright(bk, b).bitwiseAND(lit(1L)),
          b * cols.size + i)
      }
    }.reduce[Column](_.bitwiseOR(_))
    withStats.withColumn(out, z)
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** Shared min/max bucketing behind the space-filling-curve keys:
    * each column scaled into a `bits`-bit cell id, stats riding as a
    * broadcast 1-row cross join (no collect). */
  private def bucketed(df: DataFrame, cols: Seq[String],
      bits: Int): (DataFrame, Seq[Column]) = {
    val stats = df.agg(
      min(col(cols.head).cast("double")).as(s"__mn_${cols.head}"),
      cols.tail.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"))) :+
        max(col(cols.head).cast("double")).as(s"__mx_${cols.head}"): _*)
    val withStats = df.crossJoin(broadcast(stats))
    val n = (1L << bits) - 1
    val buckets = cols.map { c =>
      val span = col(s"__mx_$c") - col(s"__mn_$c")
      least(lit(n), greatest(lit(0L),
        floor((col(c).cast("double") - col(s"__mn_$c")) /
          (span + lit(1e-12)) * lit(n + 1)).cast("long")))
    }
    (withStats, buckets)
  }

  /** 2-D Hilbert curve value — [[zValue]]'s strictly-local sibling
    * (native [[graft.plans.HilbertIndex]] kernel over the same
    * min/max cell buckets). Consecutive curve positions are always
    * grid NEIGHBORS, so a contiguous curve range is one compact tile:
    * fewer boundary-straddling files than Z's diagonal jumps, hence
    * tighter per-file min/max and better pruning at the same file
    * count. Exactly two columns (the kernel is the 2-D curve — the
    * dominant layout case: (key, time), (lat, lon), (part, supplier)). */
  def hilbertValue(df: DataFrame, cols: Seq[String], bits: Int = 8,
      out: String = "__h"): DataFrame = {
    require(cols.size == 2, s"hilbertValue is 2-D, got ${cols.size} cols")
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    val (withStats, buckets) = bucketed(df, cols, bits)
    withStats.withColumn(out,
        graft.plans.HilbertIndex.hilbert(buckets.head, buckets(1), bits))
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** Deterministic contiguous Hilbert slicing — [[zorderSlices]] with
    * the Hilbert key: fixed curve-range arithmetic, no sampling, no
    * shuffle; equal curve RANGES for reproducible pruning measurement
    * (q_hilbert_gate). */
  def hilbertSlices(df: DataFrame, cols: Seq[String], slices: Int,
      bits: Int = 8): DataFrame = {
    val maxH = 1L << (2 * bits)
    val width = math.max(1L, maxH / slices)
    hilbertValue(df, cols, bits)
      .withColumn("__hslice",
        least(expr(s"__h DIV ${width}L"), lit(slices - 1L)).cast("int"))
      .drop("__h")
  }

  /** Z-order layout clustering — the multi-dimensional data-skipping
    * lever (Delta/Iceberg `OPTIMIZE ZORDER BY` shape): cluster the
    * table so per-file min/max ranges are TIGHT IN EVERY listed
    * dimension, making predicates on ANY subset of `cols` prune files.
    * A linear sort gives perfect pruning on its leading column and
    * none on the others; z-order trades a little of the first for
    * pruning on all — at 100 TB a two-column point query reads
    * ~sqrt(files) instead of all of them.
    *
    * Range-partitions by z-value (balanced under skew via reservoir
    * sampling), sorted within partitions — each output file covers a
    * contiguous z-range, i.e. a tile that is tight in every listed
    * dimension. For a deterministic (sampling-free) slice assignment —
    * e.g. to MEASURE pruning reproducibly — use [[zorderSlices]]. */
  def zorderBy(df: DataFrame, cols: Seq[String], numPartitions: Int,
      bits: Int = 8): DataFrame =
    zValue(df, cols, bits)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Deterministic contiguous z-slicing: adds `__zslice` in
    * [0, slices) by fixed z-range arithmetic — the file id a
    * contiguous z-ordered writer would produce, with NO sampling and
    * NO shuffle (a hash `repartition` on the slice id would collide
    * slices into shared partitions and wreck tile locality — measured,
    * r8). Equal z-RANGES, not equal row counts: use for reproducible
    * pruning measurement; use [[zorderBy]] for balanced layout duty. */
  def zorderSlices(df: DataFrame, cols: Seq[String], slices: Int,
      bits: Int = 8): DataFrame = {
    // divide, don't multiply: __z * slices overflows long once
    // bits*dims approaches 62 (zValue permits it), flipping slice ids
    // negative. Integer DIV by a fixed z-range width keeps every term
    // in range; least() absorbs the remainder rows of an inexact split.
    val maxZ = 1L << (bits * cols.size)
    val width = math.max(1L, maxZ / slices)
    zValue(df, cols, bits)
      .withColumn("__zslice",
        least(expr(s"__z DIV ${width}L"), lit(slices - 1L)).cast("int"))
      .drop("__z")
  }

  /** Small-file compaction — the lakehouse maintenance op (OPTIMIZE /
    * rewrite-data-files shape): a streaming sink or over-parallel
    * writer leaves thousands of KB-scale files whose per-file open/
    * footer cost dominates scans at 100 TB; rewrite the dataset into
    * ~`targetBytes` files. File count is computed from the ACTUAL
    * on-disk bytes (Hadoop FS listing — no sampling, no guessing);
    * `sortCols` optionally re-clusters during the rewrite (compaction
    * is the natural moment to restore clustering — pair with
    * [[zorderBy]]'s z-value for multi-dim). Writes to `outPath` via
    * overwrite; caller swaps directories atomically (same contract as
    * [[graft.etl.Medallion]] partitioned writes).
    *
    * Returns the file count written. Coalesce (not repartition) when
    * no sortCols: merging files needs no shuffle. */
  def compactTo(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long, sortCols: Seq[String] = Nil): Int = {
    val hPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recursive listing: a partitionBy layout (the Medallion contract
    // this claims compatibility with) nests data files under key
    // subdirectories — a flat listStatus would size it at 0 bytes and
    // collapse the whole table into one output file
    val it = fs.listFiles(hPath, true)
    var totalBytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) totalBytes += f.getLen
    }
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val laid =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else {
        // coalesce can only REDUCE partition count, and the scan may
        // already have packed the small files below the target count
        // (files.maxPartitionBytes) — report what will actually land
        val eff = math.min(nFiles, df.rdd.getNumPartitions)
        df.coalesce(math.max(1, eff))
      }
    laid.write.mode("overwrite").parquet(outPath)
    if (sortCols.nonEmpty) nFiles
    else math.max(1, math.min(nFiles, df.rdd.getNumPartitions))
  }

  /** Per-file min/max of the given columns — the data-skipping index a
    * parquet writer would persist per file/row-group for the current
    * layout. `fileKey` defaults to the physical partition id; pass an
    * explicit column (e.g. `__zslice`) to measure a deterministic
    * layout. A predicate can skip every file whose [min,max] misses
    * it. */
  def partitionStats(df: DataFrame, cols: Seq[String],
      fileKey: Option[Column] = None): DataFrame =
    df.groupBy(fileKey.getOrElse(spark_partition_id()).as("pid"))
      .agg(min(col(cols.head)).as(s"mn_${cols.head}"),
        cols.tail.flatMap(c => Seq(
          min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))) :+
          max(col(cols.head)).as(s"mx_${cols.head}"): _*)
}
