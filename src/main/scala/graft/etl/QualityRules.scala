package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the deequ / Great-Expectations
  * shape, and the productionized form of the reference's exploratory
  * column profiling (`Deliverable_2/.../data_analysis.ipynb`): a rule
  * set is declared once and evaluated in as few passes as the rules
  * allow, emitting one (rule, column, metric, threshold, pass) row per
  * rule. The check that gates a 100 TB ingest before it pollutes a
  * training corpus.
  *
  * Scale shape: every ROW-LOCAL rule (completeness, range, regex
  * shape) folds into ONE full-scan aggregate — adding rules adds agg
  * columns, not passes. Uniqueness rules ride the SAME aggregate as
  * count-distincts (Catalyst plans the multi-distinct expand — still
  * one job, one scan). Referential integrity is the only rule class
  * that joins: one broadcast/shuffle anti-join count per referenced
  * dimension. Output is |rules| rows — bounded, driver-safe.
  */
object QualityRules {

  sealed trait Rule { def ruleName: String; def column: String }

  /** Null fraction of `column` must be <= maxNullFrac. */
  case class NotNull(column: String, maxNullFrac: Double = 0.0)
    extends Rule { val ruleName = "not_null" }

  /** Fraction of rows with lo <= column <= hi (nulls count as out of
    * range) must be >= minFrac. */
  case class InRange(column: String, lo: Double, hi: Double,
      minFrac: Double = 1.0) extends Rule { val ruleName = "in_range" }

  /** Fraction of rows whose column rlike `pattern` (nulls fail) must
    * be >= minFrac. Patterns should stay in the Java∩RE2 subset when
    * an oracle needs to replay them (see [[graft.llm.Pii]]). */
  case class Matches(column: String, pattern: String,
      minFrac: Double = 1.0) extends Rule { val ruleName = "matches" }

  /** distinct(column)/count must be >= minRatio (1.0 = strictly
    * unique). Null keys count like any other single value. */
  case class Unique(column: String, minRatio: Double = 1.0)
    extends Rule { val ruleName = "unique" }

  /** Fraction of non-null `column` values present in `ref.refCol`
    * must be >= minFrac (1.0 = no orphans). */
  case class RefIntegrity(column: String, ref: DataFrame, refCol: String,
      minFrac: Double = 1.0) extends Rule { val ruleName = "ref_integrity" }

  /** Evaluate the rule set. Row-local + uniqueness rules share one
    * aggregate job; each RefIntegrity adds one anti-join count.
    * Metrics rounded 6 dp (engine-stable). Row order is the rule
    * declaration order (`rule_idx` included for deterministic
    * downstream sorts). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    val n = count(lit(1)).cast("double")
    val aggCols: Seq[Column] = rules.zipWithIndex.flatMap {
      case (r: NotNull, i) => Some(
        round(sum(when(col(r.column).isNull, 1.0).otherwise(0.0)) / n, 6)
          .as(s"m_$i"))
      case (r: InRange, i) => Some(
        round(sum(when(col(r.column) >= r.lo && col(r.column) <= r.hi,
          1.0).otherwise(0.0)) / n, 6).as(s"m_$i"))
      case (r: Matches, i) => Some(
        round(sum(when(col(r.column).rlike(r.pattern), 1.0)
          .otherwise(0.0)) / n, 6).as(s"m_$i"))
      case (r: Unique, i) => Some(
        // countDistinct skips nulls; the null group still IS a key
        // value for uniqueness duty, so add it back when present
        round((countDistinct(col(r.column)) +
          max(when(col(r.column).isNull, 1L).otherwise(0L)))
          .cast("double") / n, 6).as(s"m_$i"))
      case (_: RefIntegrity, _) => None
    }
    val wide =
      if (aggCols.nonEmpty) df.agg(aggCols.head, aggCols.tail: _*)
      else df.sparkSession.range(1).toDF("__one")
    // referential-integrity metrics ride as broadcast 1-row frames
    val withRef = rules.zipWithIndex.foldLeft(wide) {
      case (acc, (r: RefIntegrity, i)) =>
        val nonNull = df.filter(col(r.column).isNotNull)
          .select(col(r.column).as("__k"))
        val refKeys = r.ref.select(col(r.refCol).as("__k")).distinct()
        val m = nonNull.join(refKeys, Seq("__k"), "left_semi")
          .agg(count(lit(1)).cast("double").as("__hit"))
          .crossJoin(nonNull.agg(count(lit(1)).cast("double").as("__tot")))
          .select(round(
            when(col("__tot") === 0, 1.0)
              .otherwise(col("__hit") / col("__tot")), 6).as(s"m_$i"))
        acc.crossJoin(broadcast(m))
      case (acc, _) => acc
    }
    val stacked = rules.zipWithIndex.map { case (r, i) =>
      val (thr, dir) = r match {
        case x: NotNull => (x.maxNullFrac, "'<='")
        case x: InRange => (x.minFrac, "'>='")
        case x: Matches => (x.minFrac, "'>='")
        case x: Unique => (x.minRatio, "'>='")
        case x: RefIntegrity => (x.minFrac, "'>='")
      }
      val pass = r match {
        case x: NotNull => s"m_$i <= ${x.maxNullFrac}"
        case _ => s"m_$i >= $thr"
      }
      s"cast($i as int), '${r.ruleName}', '${r.column}', m_$i, " +
        s"cast($thr as double), $dir, $pass"
    }.mkString(", ")
    withRef.selectExpr(
      s"stack(${rules.size}, $stacked) AS " +
        "(rule_idx, rule, col_name, metric, threshold, direction, pass)")
  }

  /** Metric anomaly gate over a HISTORY of past [[check]] reports
    * (deequ's anomaly-detection shape): a rule can hold steady at
    * pass=true while its metric drifts toward the cliff — compare
    * each current metric to its history mean ± k·stddev and flag
    * excursions. `history` is past check() output (any subset of
    * columns incl. rule/col_name/metric); bounded by |rules| ×
    * retained runs, so the agg and join are dimension-table-sized.
    * The epsilon absorbs float jitter when a metric's history is
    * perfectly constant (stddev 0). */
  def anomalyGate(history: DataFrame, current: DataFrame,
      k: Double = 3.0, epsilon: Double = 1e-9): DataFrame = {
    val stats = history.groupBy("rule", "col_name")
      .agg(avg(col("metric")).as("mu"),
        coalesce(stddev(col("metric")), lit(0.0)).as("sigma"),
        count(lit(1)).as("n_runs"))
    current.join(broadcast(stats), Seq("rule", "col_name"), "left")
      .withColumn("anomaly",
        col("mu").isNotNull &&
          abs(col("metric") - col("mu")) > lit(k) * col("sigma") + epsilon)
  }
}
