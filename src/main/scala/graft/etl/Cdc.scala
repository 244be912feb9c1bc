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
    * Scale shape: the run id is a change-flag running sum over ONE
    * key-partitioned window (null-safe `<=>` against the lag, so a
    * null attribute is a value, not a wildcard); the per-run collapse
    * groups on (key, run) and the `valid_to` stitch is a lead over the
    * run-count-sized frame — three exchanges total, all carrying only
    * (key, order, attrs). `tieBreak` makes within-timestamp order
    * deterministic. */
  def scd2(df: DataFrame, key: String, ts: String, attrs: Seq[String],
      tieBreak: Seq[Column] = Nil): DataFrame = {
    require(attrs.nonEmpty, "scd2 needs at least one tracked attribute")
    val w = Window.partitionBy(col(key)).orderBy(col(ts) +: tieBreak: _*)
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val runs = df
      .select(col(key) +: col(ts) +: (attrs.map(col) ++ tieBreak): _*)
      .withColumn("__run", sum(when(changed, 1L).otherwise(0L)).over(w))
    val collapsed = runs
      .groupBy(col(key) +: col("__run") +: attrs.map(col): _*)
      .agg(min(col(ts)).as("valid_from"), count(lit(1)).as("n_obs"))
    val wk = Window.partitionBy(col(key)).orderBy(col("valid_from"))
    collapsed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wk))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__run")
  }
}
