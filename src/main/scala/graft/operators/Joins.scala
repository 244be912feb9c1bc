package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__rt", lit(null).cast(timeType))
    val lAligned = rightVals.foldLeft(lTagged)((df, c) =>
      df.withColumn(s"__r_$c", lit(null).cast(
        right.schema(c).dataType)))
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__rt", col(rightTime))
    val rAligned = rightVals.foldLeft(rTagged)((df, c) =>
      df.withColumn(s"__r_$c", col(c)))
    val lCols = left.columns.map(col) ++
      Seq(col("__t"), col("__side"), col("__rt")) ++
      rightVals.map(c => col(s"__r_$c"))
    val rCols = left.columns.map(c =>
      if (keys.contains(c)) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) ++
      Seq(col("__t"), col("__side"), col("__rt")) ++
      rightVals.map(c => col(s"__r_$c"))
    val unioned = lAligned.select(lCols: _*)
      .unionByName(rAligned.select(rCols: _*))
    // right rows (side 0) sort before left rows (side 1) at equal
    // timestamps => <= semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = (rightVals.map(c =>
      last(col(s"__r_$c"), ignoreNulls = true).over(w).as(c)) :+
      last(col("__rt"), ignoreNulls = true).over(w).as(s"__matched_$rightTime"))
    val out = unioned.select(
      (unioned.columns.filterNot(_.startsWith("__r_")).map(col) ++ carried): _*)
    out.filter(col("__side") === 1 && col(s"__matched_$rightTime").isNotNull)
      .drop("__t", "__side", "__rt", s"__matched_$rightTime")
  }

  /** Range join: pair rows where `leftPoint` falls inside the right
    * side's [lo, hi) interval, matching on keys. Planned as an equi-join
    * on keys with the range as a post-join predicate — for 100 TB with
    * hot keys, bucket the point and interval endpoints to a common grid
    * and join on (key, bucket) to bound the per-key fan-out. */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftPoint: String, lo: String, hi: String): DataFrame =
    left.join(right, keys).filter(
      col(leftPoint) >= col(lo) && col(leftPoint) < col(hi))
}
