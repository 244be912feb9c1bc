package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's load-band self-defense, driven synthetically: a
  * "contended sweep" whose medians are inflated against a committed
  * quiet-box baseline must flag exactly the inflated queries (capped,
  * worst-first), and the baseline parser must round-trip the
  * BENCH_FULL.json line format. No Spark session — the rules are
  * pure on purpose. */
class BenchRulesSpec extends AnyFunSuite {

  test("intra-sweep rule unchanged: median > 3x own min above floor") {
    assert(BenchRules.intraSuspect(med = 1.0, ownMin = 0.2))
    assert(!BenchRules.intraSuspect(med = 0.5, ownMin = 0.2))
    // under the 0.3 s floor nothing is suspect
    assert(!BenchRules.intraSuspect(med = 0.29, ownMin = 0.05))
    // failed queries (min -1) never retry
    assert(!BenchRules.intraSuspect(med = 5.0, ownMin = -1.0))
  }

  test("baseline rule: median > 2x committed min, floor applies") {
    assert(BenchRules.baselineSuspect(6.6, Some(2.6))) // the r11 q_kcore shape
    assert(!BenchRules.baselineSuspect(4.9, Some(2.6)))
    assert(!BenchRules.baselineSuspect(0.25, Some(0.1)))
    // no committed baseline for this query -> rule off
    assert(!BenchRules.baselineSuspect(100.0, None))
    assert(!BenchRules.baselineSuspect(100.0, Some(-1.0)))
  }

  test("synthetic contention: inflated queries flagged worst-first, capped") {
    // quiet-box baseline: 12 queries at 1 s
    val baseline = (1 to 12).map(i => s"q$i" -> 1.0).toMap
    // a loaded box inflates queries 1..10 by increasing factors
    // (2.1x..3.0x) with tight own-min (intra rule silent: med < 3x own
    // min); queries 11-12 stay nominal
    val results = (1 to 10).map { i =>
      val med = 2.0 + i * 0.1
      (s"q$i", (med, med * 0.9))
    } ++ Seq(("q11", (1.05, 1.0)), ("q12", (0.98, 0.9)))
    val flagged = BenchRules.retryList(results, baseline)
    // capped at 8, worst ratio first: q10 (3.0x) down to q3 (2.3x)
    assert(flagged == (10 to 3 by -1).map(i => s"q$i"))
    // intra-sweep suspects ride along uncapped and come first
    val withIntra = results :+ ("q13", (2.0, 0.1))
    val flagged2 = BenchRules.retryList(withIntra, baseline)
    assert(flagged2.head == "q13" && flagged2.size == 9)
  }

  test("baseline parser round-trips the BENCH_FULL.json line shape") {
    val line = """{"metric":"total","value":9.9,"unit":"sec",""" +
      """"queries":{"q_a":2.0000,"q_b":1.0000},""" +
      """"queries_min":{"q_a":1.5000,"q_b":0.8000},""" +
      """"canary":{"start":1.0,"mid":1.0,"end":1.0,"drift":1.0},""" +
      """"retry":{},"retry_canary":{},"sf":"/x"}"""
    assert(BenchRules.parseBaseline(line) ==
      Map("q_a" -> 1.5, "q_b" -> 0.8))
    // malformed/absent sections degrade to empty, never throw
    assert(BenchRules.parseBaseline("{}").isEmpty)
    assert(BenchRules.parseBaseline("""{"queries_min":{}}""").isEmpty)
    assert(BenchRules.parseBaseline("""{"queries_min":{"q":oops}}""").isEmpty)
    assert(BenchRules.loadBaseline("/nonexistent/path.json")._1.isEmpty)
    // the sf rides with the baseline: minima are per-scale-factor
    assert(BenchRules.parseBaselineSf("""{"queries_min":{},"sf":"/x/sf0.1"}""")
      == "/x/sf0.1")
  }

  test("loaded or off-sf sweeps never overwrite the committed record (r13)") {
    // quiet full sweep on the baseline's sf: the record updates
    assert(BenchRules.outFile(subset = false, loadDrift = 1.2,
      sfMatches = true, hasBaseline = true, regressed = false)
      == "BENCH_FULL.json")
    // loaded sweep (post-warmup drift past 1.5): diverted
    assert(BenchRules.outFile(subset = false, loadDrift = 1.76,
      sfMatches = true, hasBaseline = true, regressed = false)
      == "BENCH_LOADED.json")
    // uniformly-loaded sweep (flat probes, minima regressed): diverted
    assert(BenchRules.outFile(subset = false, loadDrift = 1.0,
      sfMatches = true, hasBaseline = true, regressed = true)
      == "BENCH_LOADED.json")
    // off-sf smoke (e.g. sf0.01 verify run): diverted too
    assert(BenchRules.outFile(subset = false, loadDrift = 1.0,
      sfMatches = false, hasBaseline = true, regressed = false)
      == "BENCH_LOADED.json")
    // subset A/B stays subset whatever the drift says (r12 rule)
    assert(BenchRules.outFile(subset = true, loadDrift = 9.9,
      sfMatches = true, hasBaseline = true, regressed = true)
      == "BENCH_SUBSET.json")
    // nothing committed yet: nothing to protect, first run lands
    assert(BenchRules.outFile(subset = false, loadDrift = 9.9,
      sfMatches = false, hasBaseline = false, regressed = false)
      == "BENCH_FULL.json")
  }

  test("post-warmup drift ignores a slow START probe (r13)") {
    // the r13 run-3 shape: start=0.82 is residual JIT warmup, the
    // sweep itself ran quiet — raw drift 1.87 rejected exactly the
    // run the record wanted; post-warmup reads ~1.06
    val d3 = BenchRules.postWarmupDrift(0.8203, 0.4377, 0.4437)
    assert(d3 > 1.0 && d3 < 1.1)
    // the r13 run-1 shape: END elevated = real mid-sweep contention
    assert(BenchRules.postWarmupDrift(0.6648, 0.4721, 0.7348) > 1.5)
    // invalid probes -> -1, never a fabricated ratio
    assert(BenchRules.postWarmupDrift(-1.0, 0.5, -1.0) == -1.0)
    assert(BenchRules.postWarmupDrift(0.5, -1.0, 0.5) == -1.0)
  }

  test("sum-of-mins regression catches uniform load (r13)") {
    val committed = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    // the r13 run-2 shape: everything ~12% over the record
    assert(BenchRules.minsRegress(
      Map("a" -> 1.12, "b" -> 1.13, "c" -> 1.12, "new_q" -> 0.3),
      committed))
    // ~4% over (the run-3 shape): within band, record updates
    assert(!BenchRules.minsRegress(
      Map("a" -> 1.04, "b" -> 1.05, "c" -> 1.03), committed))
    // failed queries (min -1) stay out of the comparison
    assert(!BenchRules.minsRegress(
      Map("a" -> 1.0, "b" -> -1.0, "c" -> 1.0), committed))
    // disjoint or empty: nothing to compare, never diverts on it
    assert(!BenchRules.minsRegress(Map("x" -> 9.0), committed))
    assert(!BenchRules.minsRegress(Map.empty, committed))
  }

  test("committed BENCH_FULL.json parses into a usable baseline") {
    // the real checked-in record must feed the rule (guards against
    // a future format drift silently disabling the defense)
    val (b, sf) = BenchRules.loadBaseline("BENCH_FULL.json")
    assert(b.size > 200, s"only ${b.size} baseline minima parsed")
    assert(b.contains("q_pagerank") && b("q_pagerank") > 0)
    assert(sf.endsWith("sf0.1"), s"committed record must be sf0.1: $sf")
  }
}
