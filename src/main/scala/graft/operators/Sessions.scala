package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization and funnel analysis over event streams at rest
  * — the batch twins of the streaming session window
  * ([[graft.streaming.StreamOps]] T2 session ext) and the event-order
  * analytics the reference's dashboard layer implies (cf. reference
  * `Deliverable_4/dashboard.py` per-user event slicing).
  *
  * Scale shape: both operators hash-shuffle ONCE on the session key and
  * then run per-key window passes in parallel — no global sort, no
  * driver-side state. Session assignment is the classic
  * gap-break/running-sum construction (two window functions over the
  * same (key, ts) spec — Catalyst plans them into consecutive Window
  * nodes over one Exchange). Funnel stages chain window minima over
  * that same partitioning, so the whole k-step funnel costs one
  * shuffle of (key, ts, type) triples regardless of k. Per-key row
  * counts bound window memory; skewed keys are event-stream users, not
  * power-law tokens, so AQE's skew handling suffices.
  */
object Sessions {

  /** Events with a per-key `session_seq` (1-based) assigned by
    * event-time gaps: a new session starts when the previous event of
    * the same key is more than `gapSeconds` older (or absent). Ties in
    * `ts` are totally ordered by `tieBreak` so the assignment is
    * deterministic and engine-reproducible. */
  def sessionize(df: DataFrame, key: String, ts: String,
      gapSeconds: Long, tieBreak: Seq[Column] = Nil): DataFrame = {
    val order = (col(ts) +: tieBreak).map(_.asc)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    val prev = lag(col(ts), 1).over(w)
    val isBreak = when(prev.isNull ||
      unix_timestamp(col(ts)) - unix_timestamp(prev) > gapSeconds, 1L)
      .otherwise(0L)
    df.withColumn("__brk", isBreak)
      .withColumn("session_seq",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__brk")
  }

  /** Per-session roll-up: (key, session_seq, n_events, sess_start,
    * sess_end, duration_s). One extra map-side-combined agg on the
    * already-co-partitioned (key, session_seq) — AQE reuses the
    * sessionize exchange's partitioning, so the text of the events
    * never moves twice. */
  def sessionStats(df: DataFrame, key: String, ts: String,
      gapSeconds: Long, tieBreak: Seq[Column] = Nil): DataFrame =
    sessionize(df, key, ts, gapSeconds, tieBreak)
      .groupBy(col(key), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(ts)).as("sess_start"),
        max(col(ts)).as("sess_end"))
      .withColumn("duration_s",
        unix_timestamp(col("sess_end")) - unix_timestamp(col("sess_start")))

  /** Ordered-funnel analysis: for each key, the timestamp at which each
    * step was first reached, where step i counts only if it occurs
    * STRICTLY AFTER the first completion of step i-1 (the standard
    * product-analytics funnel semantic — a purchase logged before the
    * first view does not convert a view→purchase funnel).
    *
    * Returns one row per key: (key, step_1_ts .. step_k_ts). Each
    * stage is a conditional window-min over the same per-key
    * partitioning — k window passes, ONE exchange. */
  def funnelTimes(df: DataFrame, key: String, ts: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(key))
    val staged = steps.zipWithIndex.foldLeft(df) { case (acc, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step &&
          col(s"step_${i}_ts").isNotNull &&
          col(ts) > col(s"step_${i}_ts")
      acc.withColumn(s"step_${i + 1}_ts",
        min(when(cond, col(ts))).over(w))
    }
    staged.groupBy(col(key))
      .agg(max(col("step_1_ts")).as("step_1_ts"),
        (2 to steps.size).map(i =>
          max(col(s"step_${i}_ts")).as(s"step_${i}_ts")): _*)
  }

  /** Cohort retention analysis: keys are grouped into cohorts by the
    * calendar week of their FIRST event; for each (cohort, week
    * offset) the output counts how many of the cohort's keys were
    * active that week and the retention rate vs the cohort's size
    * (its offset-0 count — every key is active in its first week by
    * construction, so the denominator needs no separate pass).
    *
    * Scale shape: one window-min over the key partitioning (first
    * event), a distinct on (key, cohort, offset) — 3 small columns,
    * text/payload never rides — and a (cohort, offset) count; the
    * cohort-size denominator is a window over the BOUNDED cohort
    * dimension. No joins, no driver state. */
  def retentionCohorts(df: DataFrame, key: String, ts: String): DataFrame = {
    val w = Window.partitionBy(col(key))
    val firstWeek = date_trunc("week", min(col(ts)).over(w))
    val eventWeek = date_trunc("week", col(ts))
    val active = df
      .withColumn("__cw", firstWeek)
      .select(col(key),
        date_format(col("__cw"), "yyyy-MM-dd").as("cohort"),
        (datediff(to_date(eventWeek), to_date(col("__cw"))) / 7)
          .cast("long").as("period_offset"))
      .distinct()
    val counts = active.groupBy("cohort", "period_offset")
      .agg(count(lit(1)).as("n_active"))
    val wc = Window.partitionBy(col("cohort"))
    counts
      .withColumn("cohort_size",
        max(when(col("period_offset") === 0, col("n_active"))).over(wc))
      .withColumn("retention",
        round(col("n_active") / col("cohort_size").cast("double"), 6))
  }

  /** Funnel summary: one row per step — keys reaching it and the
    * conversion rate from the previous step (rounded 6 dp). Bounded
    * output (|steps| rows). */
  def funnelSummary(df: DataFrame, key: String, ts: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    val times = funnelTimes(df, key, ts, typeCol, steps)
    val counts = times.agg(
      count(when(col("step_1_ts").isNotNull, 1)).as("n_1"),
      (2 to steps.size).map(i =>
        count(when(col(s"step_${i}_ts").isNotNull, 1)).as(s"n_$i")): _*)
    val stacked = steps.indices.map { i =>
      val n = i + 1
      val fromPrev =
        if (i == 0) "cast(1.0 as double)"
        else s"round(n_$n / cast(nullif(n_$i, 0) as double), 6)"
      s"'${steps(i)}', cast($n as int), n_$n, $fromPrev"
    }.mkString(", ")
    counts.selectExpr(
      s"stack(${steps.size}, $stacked) AS (step, step_idx, n_keys, conv_from_prev)")
  }

  /** Top event PATHS: the most common sequences of each key's first
    * `pathLen` events — the "how do users actually start" view that
    * funnels (which fix the steps up front) cannot give.
    *
    * Scale shape: one key window caps each key at its first `pathLen`
    * rows BEFORE any aggregation (payloads drop immediately), the
    * path string assembles per key from a pathLen-bounded struct
    * array (array_sort on the rank field keeps assembly order
    * deterministic regardless of partitioning), and the path count is
    * a map-side-combined group on strings of bounded length with a
    * TakeOrdered top-N. */
  def topPaths(df: DataFrame, key: String, ts: String, typeCol: String,
      tieBreak: Seq[Column] = Nil, pathLen: Int = 3,
      topN: Int = 20): DataFrame = {
    require(pathLen > 0 && topN > 0)
    val w = Window.partitionBy(col(key)).orderBy(col(ts) +: tieBreak: _*)
    val ranked = df
      .select(col(key) +: col(ts) +: col(typeCol) +: tieBreak: _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= pathLen)
    val paths = ranked.groupBy(col(key))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__rn"),
            col(typeCol).as("__et")))),
          x => x("__et")), "->").as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_keys"))
      .orderBy(col("n_keys").desc, col("path"))
      .limit(topN)
  }

  /** Funnel conversion LATENCY: for each consecutive step pair, how
    * long converters took (count, mean and exact-median seconds) —
    * the time-to-convert companion of [[funnelSummary]]'s rates
    * ("users purchase 40 minutes after clicking, median").
    *
    * Scale shape: rides [[funnelTimes]]'s single exchange, then ONE
    * global aggregate over the per-key step-time frame (steps-bounded
    * columns), melted long via stack. Exact medians for oracle duty —
    * the [[graft.operators.Aggregates.percentiles]] approx form is
    * the 100 TB swap. */
  def funnelLatency(df: DataFrame, key: String, ts: String,
      typeCol: String, steps: Seq[String], scale: Int = 2): DataFrame = {
    require(steps.size >= 2, "latency needs at least two funnel steps")
    val times = funnelTimes(df, key, ts, typeCol, steps)
    val withD = times.select((1 until steps.size).map(i =>
      (col(s"step_${i + 1}_ts").cast("timestamp").cast("double") -
        col(s"step_${i}_ts").cast("timestamp").cast("double"))
        .as(s"__d_$i")): _*)
    val aggs = (1 until steps.size).flatMap(i => Seq(
      count(col(s"__d_$i")).as(s"__n_$i"),
      round(avg(col(s"__d_$i")), scale).as(s"__m_$i"),
      round(expr(s"percentile(__d_$i, 0.5)"), scale).as(s"__md_$i")))
    val row = withD.agg(aggs.head, aggs.tail: _*)
    val stacked = (1 until steps.size).map(i =>
      s"'${steps(i - 1)}->${steps(i)}', $i, __n_$i, __m_$i, __md_$i")
      .mkString(", ")
    row.selectExpr(s"stack(${steps.size - 1}, $stacked) AS " +
      "(transition, step_idx, n_converted, mean_s, median_s)")
  }

  /** Peak interval concurrency per day — how many sessions/jobs/calls
    * were simultaneously open at the day's busiest instant (capacity
    * planning's first question). End-EXCLUSIVE: intervals that merely
    * touch don't overlap, and a zero-length interval counts nothing —
    * both encoded by ordering the -1 delta before the +1 at equal
    * timestamps.
    *
    * Scale shape: the classic two-level prefix-sum decomposition
    * instead of one global running sum (which would demand a single
    * totally-ordered partition). Within-day running sums ride a
    * day-partitioned window; the cross-day carry is a running sum over
    * the DAY-COUNT-bounded net-change frame, broadcast back. Identical
    * result to the global-order construction — which is exactly what
    * the SQL oracle runs. */
  def peakConcurrency(df: DataFrame, startCol: String,
      endCol: String): DataFrame = {
    val deltas = df.select(col(startCol).as("__t"), lit(1).as("__d"))
      .unionByName(df.select(col(endCol).as("__t"), lit(-1).as("__d")))
      .withColumn("__day", to_date(col("__t")))
    val w = Window.partitionBy(col("__day")).orderBy(col("__t"), col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRun = deltas.withColumn("__run", sum(col("__d")).over(w))
    val wd = Window.orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = deltas.groupBy(col("__day"))
      .agg(sum(col("__d")).as("__net"))
      .withColumn("__carry", coalesce(sum(col("__net")).over(wd), lit(0L)))
      .select(col("__day"), col("__carry"))
    withRun.join(broadcast(carries), Seq("__day"))
      .groupBy(col("__day").as("day"))
      .agg(max(col("__run") + col("__carry")).as("peak_concurrency"))
  }

  /** First-order Markov transition matrix over per-key ordered event
    * streams: for every observed (from_state, to_state) pair, the
    * count and the row-normalized transition probability — the
    * behavioral-sequence summary (what follows a click?) and the
    * generator for sequence-anomaly scoring.
    *
    * Scale shape: one window-lead over the key-partitioned stream
    * (state + order columns only — payloads never ride), then a
    * map-side-combined pair count. The per-from-state normalizer is a
    * window over the COUNTED pairs — a |states|²-bounded frame, not
    * the event stream. `tieBreak` makes within-timestamp order (and so
    * the matrix) deterministic. */
  def transitionMatrix(df: DataFrame, key: String, ts: String,
      state: String, tieBreak: Seq[Column] = Nil,
      scale: Int = 6): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts) +: tieBreak: _*)
    val pairs = df
      .select(col(key) +: col(ts) +: col(state) +: tieBreak: _*)
      .withColumn("__next", lead(col(state), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(state).as("from_state"), col("__next").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy(col("from_state"))
    pairs.withColumn("p",
      round(col("n").cast("double") / sum(col("n")).over(wf), scale))
  }

  /** Rolling N-day active keys per day — the DAU/WAU/MAU family's
    * workhorse ("7-day actives by day") computed EXACTLY without a
    * windowed count-distinct (which Spark's window functions cannot
    * express at all).
    *
    * Scale shape: the activity stream collapses to distinct
    * (key, day) pairs in one aggregate; each pair then fans out to
    * the `days` windows it participates in (a bounded ×N explode of
    * the DISTINCT frame, not the raw stream) and one count-distinct
    * group per day finishes it. Only days with observed activity are
    * reported. */
  def rollingActive(df: DataFrame, key: String, ts: String,
      days: Int = 7): DataFrame = {
    require(days >= 1)
    val du = df.select(to_date(col(ts)).as("__day"), col(key).as("__k"))
      .distinct()
    // activity on day d is visible to windows ENDING on d .. d+N-1
    val expanded = du.select(
      explode(sequence(col("__day"), date_add(col("__day"), days - 1)))
        .as("day"), col("__k"))
    expanded
      .join(du.select(col("__day").as("day")).distinct(),
        Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col("__k")).as("active_keys"))
  }

  /** Longest consecutive-calendar-day activity streak per key — the
    * gaps-and-islands construction: distinct (key, day), then
    * day - row_number(day) is CONSTANT exactly along a run of
    * consecutive days, so grouping on that anchor yields island
    * lengths and a per-key max. The engagement-streak metric next to
    * [[rollingActive]]'s window counts (rolling answers "how many
    * keys were active this week", streaks answer "how persistent is
    * each key").
    *
    * Scale shape: one distinct on (key, day) — the frame is bounded
    * by keys x active days, far below the event count — then two
    * hash aggregates riding the same key partitioning; the only
    * window is per-key over that bounded day frame. Output:
    * (key, max_streak). */
  def maxStreak(df: DataFrame, key: String, ts: String): DataFrame = {
    val days = df.select(col(key), to_date(col(ts)).as("__day")).distinct()
    val w = Window.partitionBy(col(key)).orderBy(col("__day"))
    days
      .withColumn("__anchor", date_sub(col("__day"), row_number().over(w)))
      .groupBy(col(key), col("__anchor"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(col(key))
      .agg(max(col("__len")).as("max_streak"))
  }

  /** Per-key activity-lifetime survival labels: lifetime = calendar
    * days between a key's first and last event; keys last seen within
    * `censorDays` of the corpus horizon are right-CENSORED (still
    * alive), everyone else churned at their last day. Output:
    * one (t, __churn) row per key. */
  private def activityLabels(df: DataFrame, key: String, ts: String,
      censorDays: Int): DataFrame = {
    val mx = broadcast(df.agg(max(col(ts)).as("__mx")))
    val u = df.groupBy(col(key))
      .agg(min(col(ts)).as("__fst"), max(col(ts)).as("__lst"))
    u.crossJoin(mx).select(
      datediff(to_date(col("__lst")), to_date(col("__fst"))).as("t"),
      when(col("__lst") < col("__mx") -
        expr(s"INTERVAL $censorDays DAYS"), 1).otherwise(0).as("__churn"))
  }

  /** Fixed-follow-up time-to-event survival labels: each key enters
    * the study at its FIRST event and is followed for at most
    * `horizonDays` calendar days; if its first `isEvent` row falls
    * inside the window the key is an EVENT at t = days(entry → event),
    * otherwise it is right-censored at t = `horizonDays` — the classic
    * administrative-censoring design (time-to-first-purchase,
    * time-to-activation). Unlike [[activityLabels]] this framing
    * yields a genuine event/censor mix on corpora where every key
    * stays active to the horizon. Output: one (t, __churn) row per
    * key. */
  private def followUpLabels(df: DataFrame, key: String, ts: String,
      isEvent: Column, horizonDays: Int,
      groupCol: Option[Column] = None): DataFrame = {
    val aggs = Seq(min(col(ts)).as("__fst"),
      min(when(isEvent, col(ts))).as("__evt")) ++
      groupCol.map(g => min(g.cast("string")).as("__grp"))
    val u = df.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
    val tEvt = datediff(to_date(col("__evt")), to_date(col("__fst")))
    val hit = col("__evt").isNotNull && tEvt <= lit(horizonDays)
    val labelCols = Seq(
      when(hit, tEvt).otherwise(lit(horizonDays)).as("t"),
      when(hit, 1).otherwise(0).as("__churn")) ++
      groupCol.map(_ => col("__grp"))
    u.select(labelCols: _*)
  }

  /** Shared survival risk table for [[kaplanMeier]] / [[nelsonAalen]]:
    * collapse per-key (t, __churn) labels to the lifetime-day frame
    * (t, n_events, n_censored, n_risk). The at-risk walk is a window
    * over that bounded frame (|distinct t| rows, days not keys). */
  private def riskTable(lab: DataFrame): DataFrame = {
    val g = lab.groupBy(col("t"))
      .agg(sum(col("__churn")).cast("long").as("n_events"),
        sum(lit(1) - col("__churn")).cast("long").as("n_censored"))
    val total = broadcast(lab.agg(count(lit(1)).as("__N")))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.crossJoin(total)
      .withColumn("n_risk", col("__N") -
        coalesce(sum(col("n_events") + col("n_censored")).over(wPrev),
          lit(0L)))
      .drop("__N")
  }

  /** Nelson–Aalen columns over a risk table: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ
    * plus the Fleming–Harrington survival exp(−H). */
  private def naCurve(risk: DataFrame, scale: Int): DataFrame = {
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk
      .withColumn("cum_hazard",
        round(sum(col("n_events").cast("double") / col("n_risk"))
          .over(wCum), scale))
      .withColumn("na_survival",
        round(exp(-sum(col("n_events").cast("double") / col("n_risk"))
          .over(wCum)), scale))
      .select(col("t").as("lifetime_days"), col("n_risk"),
        col("n_events"), col("n_censored"), col("cum_hazard"),
        col("na_survival"))
  }

  /** Aalen–Johansen cumulative incidence under COMPETING RISKS: each
    * key enters at its first event and the EARLIEST competing cause
    * inside `horizonDays` claims it (ties break on `causes` order);
    * keys no cause claims are censored at the horizon. Per (cause,
    * lifetime-day): CIF_c(t) = Σ_{tᵢ≤t} S(tᵢ₋₁)·d_c(tᵢ)/n(tᵢ), where
    * S is the ALL-CAUSE Kaplan-Meier left limit — the estimator that,
    * unlike one-minus-KM-per-cause, never over-counts when causes
    * compete (Σ_c CIF_c + S = 1 at every time, spec-pinned). Output:
    * (lifetime_days, cause, n_risk, n_events, cif).
    *
    * Scale shape: one per-key collapse to (t, cause) labels, then the
    * lifetime-day frame carries one column per cause — windows over
    * ≤ horizonDays+1 rows; the all-cause survival is the same
    * exp∘sum∘ln product as [[kaplanMeier]] (zero-flagged), and both
    * engines walk the identical t-ordered terms, so the 6-digit
    * round is hash-stable. */
  def competingRisks(df: DataFrame, key: String, ts: String,
      causes: Seq[(String, Column)], horizonDays: Int = 3,
      scale: Int = 6): DataFrame = {
    require(causes.nonEmpty)
    val aggs = min(col(ts)).as("__fst") +: causes.zipWithIndex.map {
      case ((_, isC), i) => min(when(isC, col(ts))).as(s"__e$i")
    }
    val u = df.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
    // earliest in-horizon cause wins; ties break on cause order via
    // the (t, idx) struct min
    val cands = causes.indices.map { i =>
      val tc = datediff(to_date(col(s"__e$i")), to_date(col("__fst")))
      when(col(s"__e$i").isNotNull && tc <= lit(horizonDays),
        struct(tc.as("t"), lit(i).as("idx")))
    }
    val win = array_min(filter(array(cands: _*), _.isNotNull))
    val lab = u.select(
      coalesce(win.getField("t"), lit(horizonDays)).as("t"),
      coalesce(win.getField("idx"), lit(-1)).as("__cause"))
    val dCols = causes.indices.map(i =>
      sum(when(col("__cause") === i, 1L).otherwise(0L)).as(s"__d$i"))
    val g = lab.groupBy(col("t"))
      .agg(dCols.head, (dCols.tail :+ count(lit(1)).as("__obs")): _*)
    val total = broadcast(lab.agg(count(lit(1)).as("__N")))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dAll = causes.indices.map(i => col(s"__d$i"))
      .reduce(_ + _)
    val risk = g.crossJoin(total)
      .withColumn("__n", col("__N") -
        coalesce(sum(col("__obs")).over(wPrev), lit(0L)))
      .withColumn("__f",
        lit(1.0) - dAll.cast("double") / col("__n"))
      .withColumn("__zero",
        max(when(col("__f") === 0.0, 1).otherwise(0)).over(wCum))
      .withColumn("__s", when(col("__zero") === 1, 0.0)
        .otherwise(exp(sum(when(col("__f") > 0.0, log(col("__f")))
          .otherwise(0.0)).over(wCum))))
      .withColumn("__sPrev",
        coalesce(lag(col("__s"), 1).over(Window.orderBy(col("t"))),
          lit(1.0)))
    val perCause = causes.zipWithIndex.map { case ((name, _), i) =>
      risk.select(col("t").as("lifetime_days"), lit(name).as("cause"),
        col("__n").as("n_risk"), col(s"__d$i").as("n_events"),
        round(sum(col("__sPrev") * col(s"__d$i").cast("double") /
          col("__n")).over(wCum), scale).as("cif"))
    }
    perCause.reduce(_ unionByName _)
  }

  /** Kaplan-Meier product-limit columns over a risk table. The product
    * is exp∘sum∘ln — associative, so it distributes — with the d=n
    * terminal point (survival exactly 0) handled by an explicit flag
    * because ln(0) is engine-divergent (null in Spark, -inf in
    * DuckDB). */
  private def kmCurve(risk: DataFrame, scale: Int): DataFrame = {
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk
      .withColumn("__f",
        lit(1.0) - col("n_events").cast("double") / col("n_risk"))
      .withColumn("__zero",
        max(when(col("__f") === 0.0, 1).otherwise(0)).over(wCum))
      .withColumn("survival", round(when(col("__zero") === 1, 0.0)
        .otherwise(exp(sum(when(col("__f") > 0.0, log(col("__f")))
          .otherwise(0.0)).over(wCum))), scale))
      .select(col("t").as("lifetime_days"), col("n_risk"),
        col("n_events"), col("n_censored"), col("survival"))
  }

  /** Nelson–Aalen cumulative hazard over the same activity-lifetime
    * frame as [[kaplanMeier]]: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ, plus the
    * Fleming–Harrington survival exp(−H). The hazard ACCUMULATES where
    * KM multiplies — better-behaved in small risk sets, and its
    * increments are the per-day hazard rates a churn model consumes.
    * The running sum is window-ordered by t, so both engines add the
    * identical terms in the identical order. */
  def nelsonAalen(df: DataFrame, key: String, ts: String,
      censorDays: Int = 3, scale: Int = 6): DataFrame =
    naCurve(riskTable(activityLabels(df, key, ts, censorDays)), scale)

  /** Nelson–Aalen hazard under the fixed-follow-up framing of
    * [[kaplanMeierToEvent]]: H(t) increments are the per-day
    * conversion hazards a propensity model consumes. */
  def nelsonAalenToEvent(df: DataFrame, key: String, ts: String,
      isEvent: Column, horizonDays: Int = 3, scale: Int = 6): DataFrame =
    naCurve(riskTable(followUpLabels(df, key, ts, isEvent, horizonDays)),
      scale)

  /** Kaplan-Meier survival estimate over per-key activity lifetimes:
    * lifetime = calendar days between a key's first and last event;
    * keys last seen within `censorDays` of the corpus end are
    * right-CENSORED (still alive), everyone else churned at their
    * last day. One row per distinct lifetime with the at-risk count,
    * events, censored and the product-limit survival — the retention
    * curve that, unlike naive churn rates, does not treat still-active
    * users as churned.
    *
    * Scale shape: the stream collapses to per-key (first, last) in
    * one aggregate, then to the LIFETIME-DAY-cardinality frame; the
    * at-risk walk, the zero-factor flag and the log-sum product all
    * ride windows over that bounded frame. */
  def kaplanMeier(df: DataFrame, key: String, ts: String,
      censorDays: Int = 3, scale: Int = 6): DataFrame =
    kmCurve(riskTable(activityLabels(df, key, ts, censorDays)), scale)

  /** Kaplan-Meier time-to-event curve under fixed follow-up: each key
    * enters at its first event and either converts (its first
    * `isEvent` row, within `horizonDays`) or is administratively
    * censored at the horizon — the time-to-first-purchase /
    * time-to-activation curve. Survival here reads "share of keys not
    * yet converted by day t", so a value strictly between 0 and 1 at
    * the horizon is the expected shape (and what the oracle fixture
    * asserts — see q_kaplan_meier). Same bounded-frame scale shape as
    * [[kaplanMeier]]. */
  def kaplanMeierToEvent(df: DataFrame, key: String, ts: String,
      isEvent: Column, horizonDays: Int = 3, scale: Int = 6): DataFrame =
    kmCurve(riskTable(followUpLabels(df, key, ts, isEvent, horizonDays)),
      scale)

  /** Shared per-cohort risk grid for [[logRank]] / [[coxPh]]: one row
    * per (cohort, pooled event time) with that cohort's events `__d`
    * and risk set `__n`, plus the pooled `__dTot`/`__nTot` — built
    * from the fixed-follow-up labels. Risk sets step down only at
    * label times, so the reversed cumulative observation count IS
    * n_g(t); the grid is (cohorts × horizonDays+1)-bounded. */
  private def survivalGrid(df: DataFrame, key: String, ts: String,
      isEvent: Column, groupCol: Column, horizonDays: Int): DataFrame = {
    // the ONE fixed-follow-up labeling rule (shared with the KM/NA
    // curves), carrying the cohort through the per-key collapse.
    // localCheckpoint (the weightedPercentiles lineage-cut pattern)
    // because the frame fans into THREE consumers below (grid,
    // distinct-t, distinct-group) — without it the per-key collapse
    // and the events scan under it re-execute per consumer
    val lab = followUpLabels(df, key, ts, isEvent, horizonDays,
      Some(groupCol)).localCheckpoint(false)
    val g = lab.groupBy(col("__grp"), col("t"))
      .agg(sum(col("__churn")).cast("long").as("__d"),
        count(lit(1)).as("__obs"))
    val allT = broadcast(lab.select(col("t")).distinct())
    val grps = broadcast(lab.select(col("__grp")).distinct())
    val wRev = Window.partitionBy(col("__grp")).orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wT = Window.partitionBy(col("t"))
    grps.crossJoin(allT)
      .join(g, Seq("__grp", "t"), "left")
      .na.fill(0L, Seq("__d", "__obs"))
      .withColumn("__n", sum(col("__obs")).over(wRev))
      .withColumn("__dTot", sum(col("__d")).over(wT))
      .withColumn("__nTot", sum(col("__n")).over(wT))
      .filter(col("__dTot") > 0L)
  }

  /** Two-cohort log-rank test under the [[kaplanMeierToEvent]]
    * fixed-follow-up framing: does cohort membership change the
    * time-to-event distribution? At each pooled event time the
    * observed events per cohort are compared with the hypergeometric
    * expectation given the pooled risk sets; the statistic
    * (O−E)²/ΣV is chi-squared with 1 df under H₀ (two cohorts — the
    * variance term below uses n·(N−n), which is the 2-sample form).
    * `groupCol` must be a KEY-LEVEL attribute (constant per key);
    * the min over the key's rows is taken for determinism. Output:
    * one row per cohort — (cohort, observed, expected, chi2), the
    * chi2 repeated (|O₁−E₁| = |O₂−E₂| by construction).
    *
    * Scale shape: the stream collapses to per-key labels in one
    * aggregate; everything after rides the (cohorts ×
    * horizon-bounded label times) grid — at most 2·(horizonDays+1)
    * rows — through windows. Counts stay integral until the E/V
    * division, and both engines apply the identical left-associated
    * float chain, so a 6-digit round is hash-stable. */
  def logRank(df: DataFrame, key: String, ts: String, isEvent: Column,
      groupCol: Column, horizonDays: Int = 3, scale: Int = 6): DataFrame = {
    val full = survivalGrid(df, key, ts, isEvent, groupCol, horizonDays)
    val e = col("__dTot").cast("double") * col("__n") / col("__nTot")
    val v = when(col("__nTot") > 1L,
      col("__dTot").cast("double") * col("__n") *
        (col("__nTot") - col("__n")) / col("__nTot") / col("__nTot") *
        (col("__nTot") - col("__dTot")) / (col("__nTot") - lit(1L)))
      .otherwise(lit(0.0))
    full
      .select(col("__grp"), col("__d"), e.as("__e"), v.as("__v"))
      .groupBy(col("__grp"))
      .agg(sum(col("__d")).as("observed"),
        sum(col("__e")).as("__esum"), sum(col("__v")).as("__vsum"))
      .select(col("__grp").as("cohort"), col("observed"),
        round(col("__esum"), scale).as("expected"),
        round(when(col("__vsum") > 0.0,
          (col("observed") - col("__esum")) *
            (col("observed") - col("__esum")) / col("__vsum"))
          .otherwise(lit(0.0)), scale).as("chi2"))
  }

  /** Restricted mean survival time: the area under the
    * [[kaplanMeierToEvent]] curve up to the follow-up horizon —
    * "average event-free days within the first τ days", the
    * clinically-preferred single-number summary when hazards are not
    * proportional. Integrates the step function exactly:
    * Σ S(tᵢ₋₁)·(tᵢ−tᵢ₋₁) + S(t_last)·(τ−t_last), over survival
    * values already rounded at `scale` so both engines integrate the
    * identical step heights. Output: ONE row (horizon_days, rmst).
    *
    * Scale shape: rides the lifetime-day-bounded KM frame; the lag
    * window and final aggregate touch at most horizonDays+1 rows. */
  def rmst(df: DataFrame, key: String, ts: String, isEvent: Column,
      horizonDays: Int = 3, scale: Int = 6): DataFrame = {
    val km = kaplanMeierToEvent(df, key, ts, isEvent, horizonDays, scale)
    val w = Window.orderBy(col("lifetime_days"))
    km
      .withColumn("__prevT",
        coalesce(lag(col("lifetime_days"), 1).over(w), lit(0)))
      .withColumn("__prevS",
        coalesce(lag(col("survival"), 1).over(w), lit(1.0)))
      .agg(
        sum((col("lifetime_days") - col("__prevT")) * col("__prevS"))
          .as("__area"),
        expr("max_by(survival, lifetime_days)").as("__lastS"),
        max(col("lifetime_days")).as("__maxT"))
      .select(lit(horizonDays).as("horizon_days"),
        round(col("__area") +
          col("__lastS") * (lit(horizonDays) - col("__maxT")), scale)
          .as("rmst"))
  }

  /** Cox proportional-hazards fit for a BINARY covariate (treated
    * cohort vs everyone else) with Breslow tie handling: the hazard
    * ratio e^β that best explains how much faster the treated cohort
    * converts, maximizing the partial likelihood by `iters` fixed
    * Newton steps from β=0. With one binary covariate the score and
    * information collapse to per-event-time scalars —
    * U(β) = Σ_t [d₁ − d·(n₁e^β)/(n₀+n₁e^β)],
    * I(β) = Σ_t [d·(n₀·(n₁e^β))/(n₀+n₁e^β)²] — so the whole fit
    * rides the [[survivalGrid]] frame. Also emits the score test at
    * β=0, U(0)²/I(0), which equals the log-rank chi² when no two
    * events share a time and otherwise differs by log-rank's
    * (n−d)/(n−1) ties factor (Breslow treats tied events as
    * sequential draws from one risk set — both spec-pinned).
    * Output: ONE row (beta, hazard_ratio, score_chi2).
    *
    * Scale shape: the distributed work is the per-key label collapse
    * + the bounded grid; the Newton loop folds over the collected
    * ≤ horizonDays+1 per-time rows (the [[markovAttribution]]
    * bounded-collect posture), sorted by t for a deterministic sum
    * order. FIXED iteration count, so the DuckDB oracle unrolls the
    * identical steps (the q_sssp protocol) and hashes exactly. */
  def coxPh(df: DataFrame, key: String, ts: String, isEvent: Column,
      groupCol: Column, treated: String, horizonDays: Int = 3,
      iters: Int = 3, scale: Int = 6): DataFrame = {
    require(iters >= 1)
    val spark = df.sparkSession
    val grid = survivalGrid(df, key, ts, isEvent, groupCol, horizonDays)
    val f = grid.groupBy(col("t"))
      .agg(max(col("__dTot")).as("__d"),
        sum(when(col("__grp") === treated, col("__d"))
          .otherwise(lit(0L))).as("__d1"),
        sum(when(col("__grp") === treated, col("__n"))
          .otherwise(lit(0L))).as("__n1"),
        sum(when(col("__grp") =!= treated, col("__n"))
          .otherwise(lit(0L))).as("__n0"))
    // bounded collect: at most horizonDays+1 rows
    val rows = f.collect().map(r => (r.getAs[Int]("t"),
      r.getAs[Long]("__d").toDouble, r.getAs[Long]("__d1").toDouble,
      r.getAs[Long]("__n1").toDouble, r.getAs[Long]("__n0").toDouble))
      .sortBy(_._1)
    def ui(beta: Double): (Double, Double) = {
      var uSum = 0.0
      var iSum = 0.0
      rows.foreach { case (_, d, d1, n1, n0) =>
        val e = math.exp(beta)
        uSum += d1 - d * (n1 * e) / (n0 + n1 * e)
        iSum += d * (n0 * (n1 * e)) /
          ((n0 + n1 * e) * (n0 + n1 * e))
      }
      (uSum, iSum)
    }
    val (u0, i0) = ui(0.0)
    val chi2 = if (i0 > 0.0) u0 * u0 / i0 else 0.0
    var beta = 0.0
    (1 to iters).foreach { _ =>
      val (u, i) = ui(beta)
      if (i > 0.0) beta += u / i
    }
    import spark.implicits._
    // round through Spark's round() so the semantics match every
    // other oracle-checked column (not JVM rint's half-to-even)
    Seq((beta, math.exp(beta), chi2))
      .toDF("__b", "__hr", "__c")
      .select(round(col("__b"), scale).as("beta"),
        round(col("__hr"), scale).as("hazard_ratio"),
        round(col("__c"), scale).as("score_chi2"))
  }

  /** Marketing-style touch attribution: credit each conversion event's
    * value to the LAST and FIRST non-conversion touch preceding it in
    * the same key's stream (conversions with no prior touch fall to
    * the `direct` channel). Output per channel: conversions and value
    * under each attribution model — the classic last-touch /
    * first-touch comparison in one pass.
    *
    * Scale shape: ONE key-partitioned window sort carrying only
    * (key, ts, type, value, tie-break); both attribution models ride
    * the same frame via ignore-nulls first/last over the
    * rows-preceding window, then a channel-bounded aggregate per
    * model, unioned. Payload columns never enter the sort. */
  def touchAttribution(df: DataFrame, key: String, ts: String,
      typeCol: String, convType: String, tieBreak: Seq[Column] = Nil,
      valueCol: String = "value", scale: Int = 2): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts) +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol) =!= convType, col(typeCol))
    val attributed = df
      .select(col(key) +: col(ts) +: col(typeCol) +:
        col(valueCol).cast("double").as("__v") +: tieBreak: _*)
      .withColumn("__last", last(touch, ignoreNulls = true).over(w))
      .withColumn("__first", first(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
    // both models stack into rows BEFORE the aggregate, so the window
    // frame is computed once and one exchange serves both (separate
    // per-model groupBys would re-sort the stream per branch —
    // plan-audited at 2x the exchanges)
    attributed
      .selectExpr(
        """stack(2,
             'last_touch', coalesce(__last, 'direct'),
             'first_touch', coalesce(__first, 'direct')) AS (model, channel)""",
        "__v")
      .groupBy(col("model"), col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(col("__v")), scale).as("attributed_value"))
  }

  /** Fractional multi-touch attribution — the two standard models
    * [[touchAttribution]]'s winner-take-all pair omits:
    * POSITION-BASED (U-shaped: 40% first touch, 40% last, 20% split
    * evenly across the middle; 100% / 50-50 for 1- and 2-touch
    * paths) and TIME-DECAY (weight ∝ 2^(−age/halfLife) at conversion
    * time, normalized per conversion). Conversions with no prior
    * touch credit `direct` with weight 1 under both models. A touch
    * precedes a conversion iff (ts, tie) is lexicographically
    * smaller — the same total order as [[touchAttribution]]'s window;
    * `tie` must make (key, ts, tie) unique for conversions (an event
    * id). Output per (model, channel): attributed_conversions
    * (Σ weights — fractional by design) and attributed_value.
    *
    * Scale shape: ONE per-key touches × conversions pair join — the
    * fan-out is journey-bounded (touches/user × conversions/user,
    * the [[graft.operators.Joins.fifoMatch]] candidate posture) and
    * carries only (key, ts, tie, channel, value); both models then
    * ride the same conversion-partitioned windows (rank, count,
    * decay-mass) before one channel-bounded aggregate. */
  def multiTouchAttribution(df: DataFrame, key: String, ts: String,
      typeCol: String, convType: String, tie: String,
      halfLifeDays: Double = 7.0, valueCol: String = "value",
      scale: Int = 6): DataFrame = {
    require(halfLifeDays > 0.0)
    val touches = df.filter(col(typeCol) =!= convType)
      .select(col(key), col(ts).as("__tts"), col(tie).as("__ttie"),
        col(typeCol).as("__ch"))
    val convs = df.filter(col(typeCol) === convType)
      .select(col(key), col(ts).as("__cts"), col(tie).as("__ctie"),
        col(valueCol).cast("double").as("__v"))
    val before = col("__tts") < col("__cts") ||
      (col("__tts") === col("__cts") && col("__ttie") < col("__ctie"))
    val pairs = convs.join(touches, Seq(key)).filter(before)
    val wConv = Window.partitionBy(col(key), col("__cts"), col("__ctie"))
    val wOrd = wConv.orderBy(col("__tts"), col("__ttie"))
    // age in fractional days through the micros reinterpretation (the
    // twap idiom — NTZ-safe under the fixed UTC session)
    val age = (unix_micros(col("__cts").cast("timestamp")) -
      unix_micros(col("__tts").cast("timestamp")))
      .cast("double") / lit(86400.0e6)
    val scored = pairs
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wConv))
      .withColumn("__raw", exp(lit(-math.log(2.0) / halfLifeDays) * age))
      .withColumn("__mass", sum(col("__raw")).over(wConv))
      .withColumn("__wPos",
        when(col("__n") === 1L, 1.0)
          .when(col("__n") === 2L, 0.5)
          .when(col("__rn") === 1L || col("__rn") === col("__n"), 0.4)
          .otherwise(lit(0.2) / (col("__n") - lit(2L))))
      .withColumn("__wDec", col("__raw") / col("__mass"))
    val attributed = scored.selectExpr(
      """stack(2,
           'position', __ch, __wPos,
           'time_decay', __ch, __wDec) AS (model, channel, __w)""",
      "__v")
    // conversions with NO prior touch -> direct, weight 1, both models
    val direct = convs
      .join(touches, Seq(key), "left")
      .withColumn("__hit", when(before, 1).otherwise(0))
      .groupBy(col(key), col("__cts"), col("__ctie"))
      .agg(max(col("__hit")).as("__any"), first(col("__v")).as("__v"))
      .filter(col("__any") === 0)
      .selectExpr(
        """stack(2,
             'position', 'direct', CAST(1.0 AS DOUBLE),
             'time_decay', 'direct', CAST(1.0 AS DOUBLE))
           AS (model, channel, __w)""",
        "__v")
    attributed.unionByName(direct)
      .groupBy(col("model"), col("channel"))
      .agg(round(sum(col("__w")), scale).as("attributed_conversions"),
        round(sum(col("__w") * col("__v")), scale).as("attributed_value"))
  }

  /** Interval-to-day allocation: explode each [start, end] interval
    * onto the calendar days it touches, with the exact microsecond
    * overlap per day — the utilization / revenue-recognition split
    * ("how much of each session belongs to each day"). Overlaps are
    * INTEGER microseconds (unix_micros of clamped bounds), so
    * downstream sums are exact and engine-independent; a zero-length
    * interval contributes one day with overlap 0.
    *
    * Scale shape: map-only — one `sequence` explode bounded by the
    * interval's day span (no join against a calendar dim, no
    * shuffle); the caller's day-level rollup is the only exchange. */
  def allocateToDays(df: DataFrame, startCol: String,
      endCol: String): DataFrame = {
    val s = col(startCol).cast("timestamp")
    val e = col(endCol).cast("timestamp")
    df.filter(e >= s)
      .withColumn("day", explode(sequence(
        date_trunc("DAY", s), date_trunc("DAY", e),
        expr("INTERVAL 1 DAY"))))
      .withColumn("overlap_us",
        unix_micros(least(e, col("day") + expr("INTERVAL 1 DAY"))) -
          unix_micros(greatest(s, col("day"))))
  }

  /** Holt double-exponential (level + trend) smoothing — [[ewma]]'s
    * two-state sibling and the trend-following forecaster the
    * seasonal-naive backtest lacks: per key, ordered,
    * l₁ = x₁, b₁ = 0, then l' = α·x + (1−α)(l+b),
    * b' = β(l'−l) + (1−β)b; appends `level`, `trend`, and the
    * one-step `forecast` = l+b. Same scale shape and same
    * bit-identity contract as [[ewma]] (the oracle's recursive CTE
    * spells out the identical expression trees, so doubles agree to
    * the ulp); same null-rejection posture. */
  def holt(df: DataFrame, key: String, orderCols: Seq[String],
      valueCol: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0 && beta >= 0.0 && beta <= 1.0,
      "alpha in (0,1], beta in [0,1]")
    val dt = org.apache.spark.sql.types.DoubleType
    val outSchema = df.schema.add("level", dt, nullable = false)
      .add("trend", dt, nullable = false)
      .add("forecast", dt, nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val kIdx = df.schema.fieldIndex(key)
    val vIdx = df.schema.fieldIndex(valueCol)
    df.repartition(col(key))
      .sortWithinPartitions((col(key) +: orderCols.map(col)): _*)
      .mapPartitions { rows =>
        var curKey: Any = null
        var started = false
        var l = 0.0
        var b = 0.0
        rows.map { r =>
          if (r.isNullAt(vIdx)) throw new IllegalArgumentException(
            s"holt: null $valueCol for key ${r.get(kIdx)}")
          val k = r.get(kIdx)
          // Number, not getDouble: int/long/float/decimal value
          // columns fold without a mid-job ClassCastException
          val x = r.get(vIdx).asInstanceOf[Number].doubleValue()
          if (!started || k != curKey) {
            curKey = k; started = true; l = x; b = 0.0
          } else {
            val lNew = alpha * x + (1.0 - alpha) * (l + b)
            b = beta * (lNew - l) + (1.0 - beta) * b
            l = lNew
          }
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ l :+ b :+ (l + b))
        }
      }(enc)
  }

  /** Batch twin of [[graft.streaming.Stateful.ewmaPerSymbol]]: the
    * exponentially weighted moving average as a per-key ordered scan —
    * s_1 = x_1, s_t = α·x_t + (1−α)·s_{t−1} — appended as an `ewma`
    * column, input rows otherwise unchanged.
    *
    * The recurrence is genuinely sequential (each output depends on
    * the previous output), so this is one of the few operators that
    * drops to mapPartitions: ONE hash shuffle on the key, a
    * partition-local (key, order) sort, and an O(1)-state single
    * pass. No windowed closed form reproduces the recurrence
    * bit-for-bit (a Σ α(1−α)^j x rewrite sums in a different order),
    * and bit-equality IS the contract here — the DuckDB recursive-CTE
    * oracle and the streaming mapGroupsWithState operator compute
    * this exact fold, so all three agree to the last ulp with no
    * rounding tolerance. Null values throw rather than silently
    * corrupting downstream state; filter them first. */
  def ewma(df: DataFrame, key: String, orderCols: Seq[String],
      valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val outSchema = df.schema.add("ewma",
      org.apache.spark.sql.types.DoubleType, nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val kIdx = df.schema.fieldIndex(key)
    val vIdx = df.schema.fieldIndex(valueCol)
    df.repartition(col(key))
      .sortWithinPartitions((col(key) +: orderCols.map(col)): _*)
      .mapPartitions { rows =>
        var curKey: Any = null
        var started = false
        var s = 0.0
        rows.map { r =>
          if (r.isNullAt(vIdx)) throw new IllegalArgumentException(
            s"ewma: null $valueCol for key ${r.get(kIdx)}")
          val k = r.get(kIdx)
          // Number, not getDouble: int/long/float/decimal value
          // columns fold without a mid-job ClassCastException
          val x = r.get(vIdx).asInstanceOf[Number].doubleValue()
          if (!started || k != curKey) { curKey = k; started = true; s = x }
          else s = alpha * x + (1.0 - alpha) * s
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ s)
        }
      }(enc)
  }

  /** Holt–Winters additive triple-exponential smoothing — the
    * seasonal top rung of the [[ewma]] → [[holt]] ladder: per key,
    * ordered, with period-m seasonal state s[0..m−1] initialized to
    * zero (the first cycle learns it),
    * l' = α(x − s[φ]) + (1−α)(l + b), b' = β(l'−l) + (1−β)b,
    * s'[φ] = γ(x − l') + (1−γ)s[φ], φ = (t−1) mod m; appends `level`,
    * `trend` and the one-step-ahead `forecast` = l' + b' + s'[φ₊₁].
    *
    * Same scale shape as [[holt]] (one hash shuffle, partition-local
    * (key, order) sort, O(m)-state single pass) and the SAME
    * BIT-IDENTITY contract: with binary-exact dyadic α/β/γ the DuckDB
    * recursive-CTE oracle — carrying the seasonal vector as a list
    * column and recomputing l' inline with the identical expression
    * tree — agrees to the last ulp, no rounding tolerance. Null
    * values throw rather than corrupting three states silently. */
  def holtWinters(df: DataFrame, key: String, orderCols: Seq[String],
      valueCol: String, alpha: Double, beta: Double, gamma: Double,
      period: Int): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0 && beta >= 0.0 && beta <= 1.0 &&
      gamma >= 0.0 && gamma <= 1.0 && period >= 2,
      "alpha in (0,1], beta/gamma in [0,1], period >= 2")
    val dt = org.apache.spark.sql.types.DoubleType
    val outSchema = df.schema.add("level", dt, nullable = false)
      .add("trend", dt, nullable = false)
      .add("forecast", dt, nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val kIdx = df.schema.fieldIndex(key)
    val vIdx = df.schema.fieldIndex(valueCol)
    df.repartition(col(key))
      .sortWithinPartitions((col(key) +: orderCols.map(col)): _*)
      .mapPartitions { rows =>
        var curKey: Any = null
        var started = false
        var l = 0.0
        var b = 0.0
        var t = 0L
        var s: Array[Double] = null
        rows.map { r =>
          if (r.isNullAt(vIdx)) throw new IllegalArgumentException(
            s"holtWinters: null $valueCol for key ${r.get(kIdx)}")
          val k = r.get(kIdx)
          val x = r.get(vIdx).asInstanceOf[Number].doubleValue()
          if (!started || k != curKey) {
            curKey = k; started = true
            l = x; b = 0.0; t = 1L
            s = new Array[Double](period)
          } else {
            t += 1
            val ph = ((t - 1) % period).toInt
            val sOld = s(ph)
            val lNew = alpha * (x - sOld) + (1.0 - alpha) * (l + b)
            b = beta * (lNew - l) + (1.0 - beta) * b
            s(ph) = gamma * (x - lNew) + (1.0 - gamma) * sOld
            l = lNew
          }
          val fc = l + b + s((t % period).toInt)
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ l :+ b :+ fc)
        }
      }(enc)
  }

  /** Per-key inter-arrival profile: day gaps between consecutive
    * events, summarized per key as mean gap, coefficient of variation
    * and the Goh–Barabási burstiness score (σ−μ)/(σ+μ) ∈ (−1, 1) —
    * −1 is a metronome, 0 a Poisson process, →1 bursty — the
    * purchase-cadence screen behind replenishment and churn models.
    * Keys with fewer than `minEvents` events are dropped (the sample
    * sd needs ≥2 gaps); all-zero-gap keys yield null cv/burstiness
    * via guarded divisors rather than throwing under ANSI.
    *
    * Scale shape: one hash exchange on the key, a per-key lag window
    * over (ts, then key order is tie-free by multiset invariance —
    * equal timestamps give the same gap multiset under any tie
    * order), and a map-side-combined per-key aggregate. Output is
    * key-cardinality. */
  def interArrival(df: DataFrame, key: String, ts: String,
      minEvents: Int = 3, scale: Int = 6): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(to_date(col(ts)))
    val gaps = df
      .withColumn("__gap",
        datediff(to_date(col(ts)), lag(to_date(col(ts)), 1).over(w))
          .cast("double"))
    val mu = avg(col("__gap"))
    val sd = stddev_samp(col("__gap"))
    gaps.groupBy(col(key))
      .agg(
        count(lit(1)).as("n_events"),
        round(mu, scale).as("mean_gap_days"),
        round(sd / when(mu =!= 0.0, mu), scale).as("cv"),
        round((sd - mu) / when(sd + mu =!= 0.0, sd + mu), scale)
          .as("burstiness"))
      .filter(col("n_events") >= minEvents)
  }

  /** Time-weighted average of a stepwise value per key (TWAP — the
    * market-data/metrics convention where a reading HOLDS until the
    * next one): each observation is weighted by the seconds until the
    * key's next observation, so an arithmetic mean over irregular
    * ticks stops over-counting bursts. The final (open-ended)
    * observation per key carries no weight — the measured-interval
    * convention an ANSI oracle can state exactly; keys with a single
    * event drop out.
    *
    * One exchange on the key, one lead window over each key's ticks,
    * one grouped sum — the [[interArrival]] shuffle profile. Ties in
    * ts are ordered by `tieBreak` for engine-stable weights. Output:
    * (key, n_ticks, twap, plain_mean) — the plain mean rides along so
    * the burst-correction is visible in the row. */
  def twap(df: DataFrame, key: String, ts: String, valueCol: String,
      tieBreak: Seq[Column], scale: Int = 6): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts) +: tieBreak: _*)
    // cast through TIMESTAMP: ts may arrive as TIMESTAMP_NTZ (the
    // nanos-repair loader), and unix_micros takes TIMESTAMP only —
    // under the engine's fixed UTC session the cast is a
    // reinterpretation, not a wall-clock shift
    val weighted = df
      .withColumn("__next", lead(col(ts), 1).over(w))
      .withColumn("__w",
        (unix_micros(col("__next").cast("timestamp")) -
          unix_micros(col(ts).cast("timestamp")))
          .cast("double") / lit(1e6))
    weighted.groupBy(col(key))
      .agg(count(lit(1)).as("n_ticks"),
        round(sum(when(col("__w").isNotNull,
            col("__w") * col(valueCol))) /
          sum(when(col("__w").isNotNull, col("__w"))), scale).as("twap"),
        round(avg(col(valueCol)), scale).as("plain_mean"))
      .filter(col("n_ticks") >= 2)
  }

  /** Cohort lifetime value: keys cohort by the calendar month of
    * their FIRST event; for each (cohort, month age) the revenue that
    * month, the cohort's cumulative revenue, and cumulative LTV per
    * cohort member — the curve every subscription/repeat-purchase
    * business reads retention economics from.
    *
    * Scale shape: first-event month is one groupBy(key) aggregate;
    * raw rows then collapse to the (cohort × age) frame — bounded by
    * the CALENDAR squared, data-size independent — before the
    * cumulative window runs per-cohort over that bounded frame.
    * Cohort sizes ride the same first-event aggregate, broadcast
    * back. Month age is (year·12+month) arithmetic, identical in any
    * engine. */
  def cohortLtv(df: DataFrame, key: String, ts: String,
      valueCol: String): DataFrame = {
    val d = to_date(col(ts))
    val firsts = df.groupBy(col(key).as("__k"))
      .agg(min(d).as("__fd"))
      .select(col("__k"),
        (year(col("__fd")) * 12 + month(col("__fd"))).as("__cm"),
        date_format(col("__fd"), "yyyy-MM").as("__cohort"))
    val sizes = firsts.groupBy(col("__cohort"))
      .agg(count(lit(1)).as("__sz"))
    val aged = df
      .join(firsts, df(key) === col("__k"))
      .withColumn("__age",
        (year(d) * 12 + month(d)) - col("__cm"))
      .groupBy(col("__cohort"), col("__age"))
      .agg(countDistinct(col("__k")).as("n_active"),
        sum(col(valueCol).cast("double")).as("__rev"))
    val wc = Window.partitionBy(col("__cohort")).orderBy(col("__age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    aged.join(broadcast(sizes), "__cohort")
      .withColumn("__cum", round(sum(col("__rev")).over(wc), 2))
      .select(
        col("__cohort").as("cohort"),
        col("__age").as("age_months"),
        col("__sz").as("cohort_size"),
        col("n_active"),
        round(col("__rev"), 2).as("revenue"),
        col("__cum").as("cum_revenue"),
        // divide the ROUNDED cumulative so both engines derive the
        // ratio from identical doubles (the seasonalDecompose trick)
        round(col("__cum") / col("__sz"), 6).as("ltv_per_user"))
  }

  /** Weekdays in [epoch, day d) by closed-form prefix arithmetic —
    * engine-portable (no dayofweek builtin: Spark counts Sunday=1,
    * the oracle engine Sunday=0; pure integer arithmetic on epoch
    * days sidesteps the dialect). Epoch day 0 = Thursday; the
    * first-k-days weekday prefix is [0,1,2,2,2,3,4]. Positive-domain
    * (post-1970) — all engine data is. */
  private def weekdaysBeforeEpochDay(d: Column): Column = {
    val r = pmod(d, lit(7L))
    val p = when(r === 0L, 0L).when(r === 1L, 1L).when(r === 2L, 2L)
      .when(r === 3L, 2L).when(r === 4L, 2L).when(r === 5L, 3L)
      .otherwise(4L)
    ((d - r) / 7L).cast("long") * 5L + p
  }

  /** Business days (Mon-Fri) in the half-open [start, end) — the
    * SLA/lead-time unit ("promised in 5 business days"): calendar
    * datediff over-counts across weekends and a UDF calendar loop
    * breaks codegen; this is two closed-form prefix evaluations.
    * Negative spans yield negative counts (antisymmetric). */
  def businessDaysBetween(startDate: Column, endDate: Column): Column = {
    val d0 = datediff(startDate, lit("1970-01-01")).cast("long")
    val d1 = datediff(endDate, lit("1970-01-01")).cast("long")
    weekdaysBeforeEpochDay(d1) - weekdaysBeforeEpochDay(d0)
  }

  /** Exponentially-decayed event counts per key — the recency-weighted
    * activity score (a user's "current" engagement where last week
    * counts more than last year): each event contributes
    * 2^(-age/halfLife) as of the corpus max timestamp (data-derived,
    * so the query is deterministic and oracle-checkable; pass a
    * literal `asOf` for production use). ONE aggregate pass; the asOf
    * anchor rides as a broadcast 1-row frame. Also the batch twin of a
    * streaming decayed counter (fold the same weight into
    * mapGroupsWithState). */
  def decayedCounts(df: DataFrame, keyCol: String, tsCol: String,
      halfLifeDays: Double, scale: Int = 6): DataFrame = {
    require(halfLifeDays > 0.0)
    val anchor = broadcast(df.agg(max(col(tsCol)).as("__asof")))
    // cast through TIMESTAMP: the nanos-repair loader yields
    // TIMESTAMP_NTZ and unix_micros takes TIMESTAMP only (the twap
    // idiom — a reinterpretation under the fixed UTC session)
    val ageDays = (unix_micros(col("__asof").cast("timestamp")) -
      unix_micros(col(tsCol).cast("timestamp")))
      .cast("double") / lit(86400.0e6)
    df.crossJoin(anchor)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        round(sum(exp(lit(-math.log(2.0) / halfLifeDays) * ageDays)),
          scale).as("decayed_count"))
  }

  /** Markov removal-effect attribution (Anderl et al. 2014) — the
    * path-aware model [[touchAttribution]]'s first/last-touch
    * heuristics approximate: build the journey transition graph
    * (START → touches → CONV | NULL), compute the conversion
    * probability by absorbing-chain iteration, and credit each channel
    * by its REMOVAL EFFECT — how much conversion probability vanishes
    * when that channel's transitions are redirected to NULL.
    * Attribution share = effect / Σ effects.
    *
    * Scale shape: journeys truncate at the first conversion (window
    * min), transitions are one lead-window pass + a hash aggregate —
    * the [[transitionMatrix]] shape; the transition table is
    * |channels+3|²-bounded (~dozens of rows), so the absorbing-chain
    * solve is a bounded driver-side collect (the BPE-argmax posture),
    * iterated a fixed 200 rounds — deterministic, geometric
    * convergence. Output: (channel, conv_prob_full, removal_effect,
    * share); the full-graph P(conv) repeats per row so a rows+gate
    * query can pin Σshare = 1 and effects ∈ [0, 1]. */
  def markovAttribution(df: DataFrame, key: String, ts: String,
      typeCol: String, convType: String, tieBreak: Seq[Column] = Nil,
      iters: Int = 200, scale: Int = 6): DataFrame = {
    val spark = df.sparkSession
    val wAll = Window.partitionBy(col(key))
    val wOrd = Window.partitionBy(col(key))
      .orderBy(col(ts) +: tieBreak: _*)
    // truncate each journey at its FIRST conversion (inclusive)
    val convTs = min(when(col(typeCol) === convType, col(ts))).over(wAll)
    val steps = df
      .select(col(key) +: col(ts) +: col(typeCol) +: tieBreak: _*)
      .withColumn("__cts", convTs)
      .filter(col("__cts").isNull || col(ts) <= col("__cts"))
      .withColumn("__state",
        when(col(typeCol) === convType, lit("__CONV")).otherwise(col(typeCol)))
      .withColumn("__next", lead(col("__state"), 1).over(wOrd))
      .withColumn("__rn", row_number().over(wOrd))
    val trans = steps.select(col("__state").as("src"),
        coalesce(col("__next"),
          when(col("__state") === "__CONV", lit("__CONV"))
            .otherwise(lit("__NULL"))).as("dst"))
      .unionByName(steps.filter(col("__rn") === 1)
        .select(lit("__START").as("src"), col("__state").as("dst")))
      .filter(col("src") =!= "__CONV") // absorbing; self-loop implied
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    // bounded collect: |channels + START|^2 rows at most; sorted so
    // the per-state float sums add in a deterministic (src, dst)
    // order — the cross-engine fixed-round oracle adds the same terms
    val rows = trans.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val outTot = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val p = rows.map { case (s, d, n) => (s, d) -> n.toDouble / outTot(s) }
      .toMap
    val channels = rows.map(_._1).filter(s => s != "__START").distinct.sorted
    // absorbing-chain conversion probability from START with an
    // optional channel removed (its outgoing mass redirected to NULL)
    def convProb(removed: Option[String]): Double = {
      val states = ("__START" +: channels).distinct
      var v = states.map(s => s -> 0.0).toMap
      (1 to iters).foreach { _ =>
        v = states.map { s =>
          val out = rows.filter(_._1 == s)
          val mass = out.map { case (_, d, _) =>
            val pr = p((s, d))
            if (removed.contains(s)) 0.0 // removed: all mass -> NULL
            else if (d == "__CONV") pr
            else if (d == "__NULL") 0.0
            else if (removed.contains(d)) 0.0
            else pr * v.getOrElse(d, 0.0)
          }.sum
          s -> mass
        }.toMap
      }
      v.getOrElse("__START", 0.0)
    }
    val full = convProb(None)
    val effects = channels.map { c =>
      val without = convProb(Some(c))
      val eff = if (full > 0) math.max(0.0, (full - without) / full) else 0.0
      (c, eff)
    }
    val effSum = effects.map(_._2).sum
    import spark.implicits._
    effects.toSeq.toDF("channel", "__eff")
      .select(col("channel"),
        round(lit(full), scale).as("conv_prob_full"),
        round(col("__eff"), scale).as("removal_effect"),
        round(when(lit(effSum) > 0.0, col("__eff") / effSum)
          .otherwise(lit(0.0)), scale).as("share"))
  }
}
