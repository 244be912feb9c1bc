package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via `flatMapGroupsWithState` (the Structured
  * Streaming state API named in SURVEY §1.3's engine mapping). Example
  * operator: per-symbol EWMA of price with inactivity-timeout flush —
  * the kind of incremental per-key statistic that windowed aggregation
  * cannot express (state is a recurrence over arrival order, not a
  * bucket aggregate).
  *
  * Scale posture: state per key is O(1) (a Double + count); the state
  * store shuffles by symbol exactly once; timeouts bound state lifetime
  * for dead keys.
  */
object Stateful {

  case class PricePoint(symbol: String, timestamp: Long, price: Double)
  case class EwmaState(ewma: Double, n: Long, maxTs: Long = Long.MinValue)
  case class EwmaOut(symbol: String, timestamp: Long, price: Double,
      ewma: Double, n: Long)

  /** EWMA with smoothing `alpha`, emitted per input record. Works on a
    * streaming OR batch Dataset[PricePoint] grouped by symbol (batch
    * runs the same function via mapGroups semantics in tests).
    *
    * With `ProcessingTimeTimeout` the key's state is dropped after
    * `timeoutMs` of inactivity; with `EventTimeTimeout` after the
    * watermark passes last-seen + `timeoutMs` (requires an upstream
    * `withWatermark`). */
  def ewmaPerSymbol(points: Dataset[PricePoint], alpha: Double,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      timeoutMs: Long = 600000L)
      : Dataset[EwmaOut] = {
    import points.sparkSession.implicits._
    points
      .groupByKey(_.symbol)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append(), timeout) {
        case (symbol, rows, state: GroupState[EwmaState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // arrival order within a batch is not guaranteed — order by
            // event timestamp so the recurrence is deterministic
            val sorted = rows.toSeq.sortBy(p => (p.timestamp, p.price))
            var st = state.getOption.getOrElse(EwmaState(0.0, 0L))
            val out = sorted.map { p =>
              val ts = math.max(st.maxTs, p.timestamp)
              st =
                if (st.n == 0L) EwmaState(p.price, 1L, ts)
                else EwmaState(alpha * p.price + (1 - alpha) * st.ewma,
                  st.n + 1, ts)
              EwmaOut(symbol, p.timestamp, p.price, st.ewma, st.n)
            }
            state.update(st)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(timeoutMs)
            else if (timeout == GroupStateTimeout.EventTimeTimeout) {
              // key-relative expiry: the key's max SEEN event time +
              // timeoutMs (per the contract above), clamped above the
              // current watermark because Spark rejects timeout
              // timestamps at or below it — late-arriving keys expire
              // at the earliest legal instant instead of throwing
              state.setTimeoutTimestamp(
                math.max(st.maxTs + timeoutMs,
                  state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  case class HwState(level: Double, trend: Double, seas: Array[Double],
      n: Long, maxTs: Long = Long.MinValue)
  case class HwOut(symbol: String, timestamp: Long, price: Double,
      level: Double, trend: Double, forecast: Double, n: Long)

  /** Streaming twin of [[graft.operators.Sessions.holtWinters]]: the
    * additive triple-exponential recurrence as keyed state —
    * level/trend doubles plus the period-m seasonal array, O(m) per
    * key. Same expression trees as the batch fold, so a MemoryStream
    * replay of the batch input produces BIT-IDENTICAL level/trend/
    * forecast columns (StatefulSpec asserts it); same timeout
    * contract as [[ewmaPerSymbol]].
    *
    * Arrival order within a micro-batch is not guaranteed — rows sort
    * by (timestamp, price) before folding so the recurrence is
    * deterministic; ACROSS batches the stream must deliver in event
    * order (the recurrence is order-defined, as with any incremental
    * smoother). */
  def holtWintersPerSymbol(points: Dataset[PricePoint], alpha: Double,
      beta: Double, gamma: Double, period: Int,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      timeoutMs: Long = 600000L): Dataset[HwOut] = {
    require(alpha > 0.0 && alpha <= 1.0 && beta >= 0.0 && beta <= 1.0 &&
      gamma >= 0.0 && gamma <= 1.0 && period >= 2)
    import points.sparkSession.implicits._
    points
      .groupByKey(_.symbol)
      .flatMapGroupsWithState[HwState, HwOut](
        OutputMode.Append(), timeout) {
        case (symbol, rows, state: GroupState[HwState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(p => (p.timestamp, p.price))
            var st = state.getOption.getOrElse(
              HwState(0.0, 0.0, new Array[Double](period), 0L))
            val out = sorted.map { p =>
              val ts = math.max(st.maxTs, p.timestamp)
              st =
                if (st.n == 0L)
                  HwState(p.price, 0.0, new Array[Double](period), 1L, ts)
                else {
                  val t = st.n + 1
                  val ph = ((t - 1) % period).toInt
                  val s = st.seas.clone()
                  val sOld = s(ph)
                  val lNew = alpha * (p.price - sOld) +
                    (1.0 - alpha) * (st.level + st.trend)
                  val bNew = beta * (lNew - st.level) +
                    (1.0 - beta) * st.trend
                  s(ph) = gamma * (p.price - lNew) + (1.0 - gamma) * sOld
                  HwState(lNew, bNew, s, t, ts)
                }
              val fc = st.level + st.trend +
                st.seas((st.n % period).toInt)
              HwOut(symbol, p.timestamp, p.price, st.level, st.trend,
                fc, st.n)
            }
            state.update(st)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(timeoutMs)
            else if (timeout == GroupStateTimeout.EventTimeTimeout)
              state.setTimeoutTimestamp(
                math.max(st.maxTs + timeoutMs,
                  state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  case class TouchEvent(key: String, timestamp: Long, eventType: String,
      value: Double, tie: Long = 0L)
  case class TouchState(first: Option[String], last: Option[String],
      maxTs: Long = Long.MinValue)
  case class TouchOut(key: String, timestamp: Long, model: String,
      channel: String, value: Double)

  /** Streaming twin of [[graft.operators.Sessions.touchAttribution]]:
    * per-key state is the (first, last) non-conversion touch seen so
    * far — two strings, O(1) per key. Each conversion event emits TWO
    * attribution rows (model = last_touch / first_touch, channel =
    * the carried touch or `direct` when none), exactly the rows the
    * batch operator's stack() produces BEFORE its channel aggregate —
    * so `out.groupBy(model, channel).agg(count, sum(value))` equals
    * the batch output on an in-order replay (StatefulSpec asserts
    * it). Conversions do not update the touches (they are not touches
    * in the batch window either), so consecutive conversions credit
    * the same carried pair.
    *
    * Arrival order within a micro-batch is not guaranteed — rows sort
    * by (timestamp, tie) before folding, mirroring the batch
    * operator's (ts, tieBreak) window order; across batches the
    * stream must deliver in event order (the carried touch pair is
    * order-defined). Same timeout contract as [[ewmaPerSymbol]]. */
  def touchAttributionStream(events: Dataset[TouchEvent],
      convType: String,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      timeoutMs: Long = 600000L): Dataset[TouchOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[TouchState, TouchOut](
        OutputMode.Append(), timeout) {
        case (key, rows, state: GroupState[TouchState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.timestamp, e.tie))
            var st = state.getOption.getOrElse(TouchState(None, None))
            val out = Seq.newBuilder[TouchOut]
            sorted.foreach { e =>
              val ts = math.max(st.maxTs, e.timestamp)
              if (e.eventType == convType) {
                out += TouchOut(key, e.timestamp, "last_touch",
                  st.last.getOrElse("direct"), e.value)
                out += TouchOut(key, e.timestamp, "first_touch",
                  st.first.getOrElse("direct"), e.value)
                st = st.copy(maxTs = ts)
              } else {
                st = TouchState(st.first.orElse(Some(e.eventType)),
                  Some(e.eventType), ts)
              }
            }
            state.update(st)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(timeoutMs)
            else if (timeout == GroupStateTimeout.EventTimeTimeout)
              state.setTimeoutTimestamp(
                math.max(st.maxTs + timeoutMs,
                  state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  case class MultiTouchState(touches: Vector[(Long, Long, String)],
      maxTs: Long = Long.MinValue)
  case class MultiTouchOut(key: String, timestamp: Long, model: String,
      channel: String, weight: Double, value: Double)

  /** Streaming twin of
    * [[graft.operators.Sessions.multiTouchAttribution]] — the
    * fractional models the r10 last/first-touch twin omitted:
    * per-key state is the BOUNDED journey touch list
    * ((ts, tie, channel) triples, `maxTouches` cap); each conversion
    * emits one row per (retained touch × model) with the U-shaped
    * position weight (100% / 50-50 / 40-20-40) and the normalized
    * 2^(−age/halfLife) time-decay weight, plus the weight-1 `direct`
    * pair when no touch precedes it — exactly the rows the batch
    * operator's stack() produces before its channel aggregate, so
    * `groupBy(model, channel).agg(round(sum(weight)),
    * round(sum(weight*value)))` equals the batch output on an
    * in-order replay (StatefulSpec asserts it, cross-batch). Age is
    * (convMs − touchMs)/86400e3 fractional days — bit-identical to
    * the batch micros/86400e6 (both divisions are correctly rounded
    * to the same real).
    *
    * SPILL RULE (the cap): when a journey exceeds `maxTouches`, the
    * FIRST touch is pinned and the OLDEST MIDDLE touch drops —
    * U-shape needs first+last exactly, and time-decay mass lives in
    * the recent tail, so dropping old middles loses the least
    * attribution mass; beyond-cap journeys are therefore an
    * approximation (weights computed over the retained list), the
    * documented trade for O(maxTouches) state per key. Same
    * ordering contract and timeout posture as
    * [[touchAttributionStream]]. */
  def multiTouchAttributionStream(events: Dataset[TouchEvent],
      convType: String, halfLifeDays: Double = 7.0,
      maxTouches: Int = 64,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      timeoutMs: Long = 600000L): Dataset[MultiTouchOut] = {
    require(halfLifeDays > 0.0 && maxTouches >= 2)
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[MultiTouchState, MultiTouchOut](
        OutputMode.Append(), timeout) {
        case (key, rows, state: GroupState[MultiTouchState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.timestamp, e.tie))
            var st = state.getOption.getOrElse(MultiTouchState(Vector()))
            val out = Seq.newBuilder[MultiTouchOut]
            sorted.foreach { e =>
              val ts = math.max(st.maxTs, e.timestamp)
              if (e.eventType == convType) {
                val n = st.touches.length
                if (n == 0) {
                  out += MultiTouchOut(key, e.timestamp, "position",
                    "direct", 1.0, e.value)
                  out += MultiTouchOut(key, e.timestamp, "time_decay",
                    "direct", 1.0, e.value)
                } else {
                  // identical float chain to the batch operator:
                  // exp(-ln2/halfLife * ageDays), normalized by the
                  // in-order mass sum
                  val raws = st.touches.map { case (tts, _, _) =>
                    val ageDays =
                      (e.timestamp - tts).toDouble / 86400.0e3
                    math.exp(-math.log(2.0) / halfLifeDays * ageDays)
                  }
                  val mass = raws.sum
                  st.touches.zipWithIndex.foreach {
                    case ((_, _, ch), i) =>
                      val wPos =
                        if (n == 1) 1.0
                        else if (n == 2) 0.5
                        else if (i == 0 || i == n - 1) 0.4
                        else 0.2 / (n - 2)
                      out += MultiTouchOut(key, e.timestamp,
                        "position", ch, wPos, e.value)
                      out += MultiTouchOut(key, e.timestamp,
                        "time_decay", ch, raws(i) / mass, e.value)
                  }
                }
                st = st.copy(maxTs = ts)
              } else {
                val kept =
                  if (st.touches.length < maxTouches) st.touches
                  else st.touches.patch(1, Nil, 1) // pin first, drop
                                                   // oldest middle
                st = MultiTouchState(
                  kept :+ ((e.timestamp, e.tie, e.eventType)), ts)
              }
            }
            state.update(st)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(timeoutMs)
            else if (timeout == GroupStateTimeout.EventTimeTimeout)
              state.setTimeoutTimestamp(
                math.max(st.maxTs + timeoutMs,
                  state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  case class DecayEvent(key: String, timestamp: Long, weight: Double)
  case class DecayState(mass: Double, lastTs: Long, n: Long = 0L)
  case class DecayOut(key: String, timestamp: Long, decayed: Double,
      n: Long)

  /** Streaming exponentially-decayed counter — the live twin of
    * [[graft.operators.Sessions.decayedCounts]]: per-key state is ONE
    * (mass, lastTs) pair; each event first decays the carried mass by
    * 2^(-Δt/halfLife) and then adds its weight, which telescopes to
    * exactly the batch sum Σ w_i·2^(-(t_last - t_i)/halfLife) — the
    * recency-weighted activity score maintained incrementally instead
    * of rescanning history every trigger (parity spec-asserted).
    * Out-of-order arrivals within a batch sort by timestamp; an event
    * older than the carried state would need a NEGATIVE decay — it
    * folds in undecayed-forward (its own age is honored, the carried
    * mass never un-decays), the standard approximation for modest
    * disorder; bound disorder with an upstream watermark. */
  def decayedCounter(events: Dataset[DecayEvent], halfLifeMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      timeoutMs: Long = 600000L): Dataset[DecayOut] = {
    require(halfLifeMs > 0L)
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[DecayState, DecayOut](
        OutputMode.Append(), timeout) {
        case (key, rows, state: GroupState[DecayState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.timestamp, e.weight))
            var st = state.getOption.getOrElse(DecayState(0.0, Long.MinValue))
            val out = sorted.map { e =>
              val dt = if (st.lastTs == Long.MinValue) 0L
                else math.max(0L, e.timestamp - st.lastTs)
              val decayed = st.mass *
                math.pow(2.0, -dt.toDouble / halfLifeMs) + e.weight
              st = DecayState(decayed, math.max(st.lastTs, e.timestamp),
                st.n + 1)
              DecayOut(key, e.timestamp, decayed, st.n)
            }
            state.update(st)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(timeoutMs)
            else if (timeout == GroupStateTimeout.EventTimeTimeout)
              state.setTimeoutTimestamp(
                math.max(st.lastTs + timeoutMs,
                  state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
