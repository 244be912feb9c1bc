package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.llm.Mixing

/** Corpus-mixing operators: temperature resampling, JS divergence,
  * OOV coverage, token-budget selection. */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: DataFrame =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("temperatureRates: uniform corpus keeps targetFrac everywhere") {
    val df = Seq.tabulate(100)(i => (i.toLong, s"src${i % 4}"))
      .toDF("id", "source")
    val rates = Mixing.temperatureRates(df, "source", 0.3, 0.4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates.size == 4)
    // balanced shares: p^alpha renormalizes to the same shares, so
    // every stratum's accept rate is exactly the target fraction
    rates.values.foreach(a => assert(math.abs(a - 0.4) < 1e-12))
  }

  test("temperatureRates: skewed corpus upweights the tail") {
    val df = (Seq.tabulate(900)(i => (i.toLong, "big")) ++
      Seq.tabulate(100)(i => (900L + i, "small"))).toDF("id", "source")
    val rates = Mixing.temperatureRates(df, "source", 0.3, 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("small") > rates("big"),
      s"tail stratum must keep a higher rate: $rates")
    assert(rates.values.forall(a => a > 0.0 && a <= 1.0))
  }

  test("temperatureResample: null stratum is resampled, not dropped") {
    val df = (Seq.tabulate(40)(i => (i.toLong, Option("a"))) ++
      Seq.tabulate(40)(i => (40L + i, Option.empty[String])))
      .toDF("id", "source")
    val kept = Mixing.temperatureResample(df, "source", col("id"), 0.3, 0.5)
    val nullKept = kept.filter(col("source").isNull).count()
    assert(nullKept > 0, "null-stratum rows must survive the rate join")
    assert(kept.count() < 80)
  }

  test("temperatureResample: deterministic and partitioning-independent") {
    val a = Mixing.temperatureResample(docs, "source", col("doc_id"), 0.3, 0.5)
      .select("doc_id").as[Long].collect().sorted
    val b = Mixing.temperatureResample(docs.repartition(7), "source",
        col("doc_id"), 0.3, 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(a.nonEmpty && a.length < 500)
    assert(a.sameElements(b))
  }

  test("jsDivergence: identical slices diverge by zero") {
    val r = Mixing.jsDivergence(docs, docs, "text").collect()(0)
    assert(r.getDouble(r.fieldIndex("js_divergence")) == 0.0)
  }

  test("jsDivergence: disjoint vocabularies diverge by ln 2, symmetric") {
    val a = Seq("x x x", "y y").toDF("text")
    val b = Seq("u u", "v").toDF("text")
    val ab = Mixing.jsDivergence(a, b, "text").collect()(0).getDouble(1)
    val ba = Mixing.jsDivergence(b, a, "text").collect()(0).getDouble(1)
    assert(math.abs(ab - math.log(2.0)) < 1e-6)
    assert(ab == ba)
  }

  test("oovRate: full vocabulary means zero OOV everywhere") {
    val nVocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .select("w").distinct().count().toInt
    val r = Mixing.oovRate(docs, "text", "lang", nVocab)
      .select("oov_rate").as[Double].collect()
    assert(r.nonEmpty && r.forall(_ == 0.0))
  }

  test("oovRate: tiny vocabulary leaves most tokens OOV") {
    val r = Mixing.oovRate(docs, "text", "lang", 2)
      .select("oov_rate").as[Double].collect()
    assert(r.forall(x => x > 0.5 && x < 1.0))
  }

  test("shuffleShards: complete, deterministic, positions dense per shard") {
    val a = Mixing.shuffleShards(docs.select("doc_id"), col("doc_id"), 8)
    val b = Mixing.shuffleShards(docs.repartition(7).select("doc_id"),
      col("doc_id"), 8)
    val rows = a.collect().map(r =>
      (r.getLong(0), r.getLong(r.fieldIndex("shard")),
        r.getInt(r.fieldIndex("pos"))))
    // every doc exactly once; partitioning-independent assignment
    assert(rows.length == 500)
    assert(rows.map(_._1).distinct.length == 500)
    assert(rows.toSet == b.collect().map(r =>
      (r.getLong(0), r.getLong(r.fieldIndex("shard")),
        r.getInt(r.fieldIndex("pos")))).toSet)
    // positions are 1..n within each shard, no gaps or dups
    rows.groupBy(_._2).foreach { case (shard, g) =>
      assert(g.map(_._3).sorted.sameElements(1 to g.length), s"shard $shard")
    }
    // shard and position hashes are decorrelated: within a shard, the
    // doc ids are not ordered by id (a correlated hash would sort them)
    val someShard = rows.groupBy(_._2).values.maxBy(_.length)
      .sortBy(_._3).map(_._1)
    assert(!someShard.sorted.sameElements(someShard))
  }

  test("materializeEpochs: floor repeats exact, shares approach plan") {
    // skewed corpus: 'big' has 9x the tokens of 'small'
    val df = (Seq.tabulate(180)(i => (i.toLong, "big", "w w w w w")) ++
      Seq.tabulate(20)(i => (200L + i, "small", "w w w w w")))
      .toDF("id", "source", "text")
    val plan = Mixing.epochPlan(df, "source", "text", 0.3, 2000L)
    val planRows = plan.collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("epochs"))).toMap
    // tail stratum must be repeated harder than the head
    assert(planRows("small") > planRows("big"), planRows.toString)
    val out = Mixing.materializeEpochs(df, plan, "source", col("id"))
    val copies = out.groupBy("id").count()
      .join(df.select("id", "source"), "id")
      .select("source", "count").as[(String, Long)].collect()
    copies.groupBy(_._1).foreach { case (src, g) =>
      val e = planRows(src)
      // every doc appears floor(e) or floor(e)+1 times
      assert(g.forall { case (_, c) =>
        c == math.floor(e).toLong || c == math.floor(e).toLong + 1 }, src)
    }
    // realized token share within a few points of the plan share
    val shares = plan.collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("share"))).toMap
    val tok = out.groupBy("source").count().as[(String, Long)].collect().toMap
    val total = tok.values.sum.toDouble
    shares.foreach { case (src, share) =>
      assert(math.abs(tok(src) / total - share) < 0.05, s"$src $shares $tok")
    }
    // deterministic under repartitioning
    val again = Mixing.materializeEpochs(
      df.repartition(7), plan, "source", col("id"))
      .groupBy("id").count().as[(Long, Long)].collect().toSet
    assert(again == out.groupBy("id").count()
      .as[(Long, Long)].collect().toSet)
  }

  test("qualityPercentileFilter keeps each stratum's own top slice") {
    val kept = Mixing.qualityPercentileFilter(
      docs, "text", "doc_id", "source", 0.5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val all = docs.select(col("doc_id"), col("source"),
        graft.functions.Text.qualityScore(col("text")).as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    all.groupBy(_._2).foreach { case (src, g) =>
      val keptHere = kept.filter(_._2 == src)
      // roughly half per stratum (percent_rank <= 0.5 keeps ceil(n/2)
      // plus quality ties straddling the cut)
      assert(keptHere.length >= g.length / 2 &&
        keptHere.length <= g.length / 2 + 2, s"$src: ${keptHere.length}/${g.length}")
      // every kept doc is at least as good as every dropped doc
      val dropped = g.map(_._1).toSet -- keptHere.map(_._1).toSet
      if (dropped.nonEmpty && keptHere.nonEmpty) {
        val worstKept = keptHere.map(_._3).min
        val bestDropped = g.filter(d => dropped.contains(d._1)).map(_._3).max
        assert(worstKept >= bestDropped, src)
      }
    }
  }

  test("applyRates: strata unseen at fit time pass through, not vanish") {
    // rates fitted on an en/zh-only snapshot; the applied frame carries
    // a brand-new 'de' stratum (the stream-after-snapshot case)
    val snapshot = Seq((1L, "en"), (2L, "en"), (3L, "zh"))
      .toDF("doc_id", "source")
    val rates = Mixing.temperatureRates(snapshot, "source", 0.5, 1.0)
    val incoming = (Seq.tabulate(50)(i => (100L + i, "de")) ++
      Seq((1L, "en"))).toDF("doc_id", "source")
    val out = Mixing.applyRates(incoming, rates, "source", col("doc_id"))
    val bySrc = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // every unseen-stratum doc kept (rate defaults to 1.0)
    assert(bySrc.get("de").contains(50L), bySrc.toString)
    // unseen strata are marked: accept_rate stays null for the caller
    assert(out.filter(col("source") === "de")
      .filter(col("accept_rate").isNotNull).isEmpty)
  }

  test("materializeEpochs: empty plan yields empty output, not an NPE") {
    val none = Seq.empty[(Long, String, String)]
      .toDF("id", "source", "text")
    val plan = Mixing.epochPlan(
      Seq((1L, "en", "w w")).toDF("id", "source", "text"),
      "source", "text", 0.5, 100L)
      .filter(col("source") === "absent") // empty plan frame
    assert(Mixing.materializeEpochs(none, plan, "source", col("id")).isEmpty)
  }

  test("applyRates resamples a live stream statelessly") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // rates fitted on the batch corpus snapshot...
    val rates = Mixing.temperatureRates(docs, "source", 0.3, 0.5)
    // ...applied to a stream of incoming docs (append mode — no state)
    val mem = MemoryStream[(Long, String)]
    val stream = Mixing.applyRates(
      mem.toDF().toDF("doc_id", "source"), rates, "source", col("doc_id"))
    val q = stream.writeStream.format("memory")
      .queryName("mix_stream").outputMode("append").start()
    try {
      val batchIds = docs.select("doc_id", "source")
        .as[(Long, String)].collect()
      mem.addData(batchIds.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("mix_stream")
      .select("doc_id").as[Long].collect().toSet
    // stream selection == batch selection (same rates, same hash)
    val batch = Mixing.applyRates(
        docs.select("doc_id", "source"), rates, "source", col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("drift monitor: streamed window counts -> JS matches batch slices") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val en = docs.filter(col("lang") === "en").select("text")
      .as[String].collect()
    val zh = docs.filter(col("lang") === "zh").select("text")
      .as[String].collect()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val counts = graft.streaming.StreamOps.tokenWindowCounts(
      mem.toDF().toDF("ts", "text"), "text", "ts", "10 minutes", "1 minute")
    val q = counts.writeStream.format("memory").queryName("drift_counts")
      .outputMode("append").start()
    try {
      // window A: the en slice; window B: the zh slice
      mem.addData(en.toIndexedSeq.map((ts("2024-01-01 00:01:00"), _)))
      mem.addData(zh.toIndexedSeq.map((ts("2024-01-01 00:11:00"), _)))
      q.processAllAvailable()
      // sentinel far ahead advances the watermark, finalizing A and B
      mem.addData(Seq((ts("2024-01-01 01:00:00"), "flush")))
      q.processAllAvailable()
    } finally q.stop()
    val finalized = spark.table("drift_counts")
      .select(col("win"), col("w"), col("cnt"))
    val js = graft.llm.Mixing.jsAgainstReference(finalized, docs, "text")
      .select(col("win.start").cast("string"), col("js_divergence"))
      .as[(String, Double)].collect().toMap
    assert(js.size == 2, js.toString)
    // parity with the batch operator on the same slices
    val batchA = graft.llm.Mixing.jsDivergence(
      docs.filter(col("lang") === "en"), docs, "text")
      .select("js_divergence").as[Double].head()
    val batchB = graft.llm.Mixing.jsDivergence(
      docs.filter(col("lang") === "zh"), docs, "text")
      .select("js_divergence").as[Double].head()
    assert(math.abs(js("2024-01-01 00:00:00") - batchA) <= 1e-6)
    assert(math.abs(js("2024-01-01 00:10:00") - batchB) <= 1e-6)
    // the zh slice drifts further from the (en-heavy) corpus than en
    assert(js("2024-01-01 00:10:00") > js("2024-01-01 00:00:00"))
  }

  test("assembleTrainingSet: end-to-end deterministic sharded corpus") {
    import graft.llm.CorpusPipeline
    val evalSet = docs.filter(col("doc_id") < 20)
    val train = docs.filter(col("doc_id") >= 20)
    val cfg = CorpusPipeline.AssemblyConfig(
      prepare = CorpusPipeline.Config(minQuality = 0.1),
      targetFrac = 0.8, budgetTokens = 8000L, nShards = 4)
    val out = CorpusPipeline.assembleTrainingSet(
      train, "doc_id", "text", Some(evalSet), cfg).cache()
    val rows = out.select("doc_id", "n_tokens", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    graft.llm.Mixing.releaseCaches(); graft.llm.Dedup.releaseCaches()
    // budget respected; every doc once; shard positions dense
    assert(rows.nonEmpty && rows.map(_._2).sum <= 8000L)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._3).foreach { case (shard, g) =>
      assert(g.map(_._4).sorted.sameElements(1 to g.length), s"shard $shard")
    }
    // decontamination: no selected doc is an eval doc's duplicate
    val evalFps = evalSet
      .select(graft.functions.Text.fingerprint(col("text"))).as[String]
      .collect().toSet
    val keptFps = out
      .select(graft.functions.Text.fingerprint(col("text"))).as[String]
      .collect().toSet
    assert(keptFps.intersect(evalFps).isEmpty)
    // end-to-end determinism under different input partitioning
    val again = CorpusPipeline.assembleTrainingSet(
      train.repartition(7), "doc_id", "text", Some(evalSet), cfg)
      .select("doc_id", "n_tokens", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    graft.llm.Mixing.releaseCaches(); graft.llm.Dedup.releaseCaches()
    assert(rows.toSet == again.toSet)
    out.unpersist()
  }

  /** Naive single-window form of the budget selection (the oracle's
    * plan shape) — ground truth for the two-phase implementation. */
  private def naiveBudget(budget: Long): Set[Long] =
    docs.select(col("doc_id"),
        Text.qualityScore(col("text")).as("quality"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(
        Window.orderBy(col("quality").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= budget)
      .select("doc_id").as[Long].collect().toSet

  test("tokenBudgetSelect: two-phase plan equals the naive ordered window") {
    for (budget <- Seq(0L, 500L, 5000L, 10000L, 1000000L)) {
      val twoPhase = Mixing.tokenBudgetSelect(docs, "text", "doc_id", budget)
        .select("doc_id").as[Long].collect().toSet
      assert(twoPhase == naiveBudget(budget), s"budget=$budget")
    }
  }

  test("tokenBudgetSelect: budget is binding and selection is maximal") {
    val kept = Mixing.tokenBudgetSelect(docs, "text", "doc_id", 5000L)
    val total = kept.agg(sum("n_tokens")).as[Long].collect()(0)
    assert(total <= 5000L)
    // maximality: the best unkept doc would overflow the budget
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    val nextBest = docs
      .filter(!col("doc_id").isInCollection(keptIds))
      .select(col("doc_id"), Text.qualityScore(col("text")).as("q"),
        Text.tokenCount(col("text")).cast("long").as("t"))
      .orderBy(col("q").desc, col("doc_id")).limit(1)
      .select("t").as[Long].collect()
    nextBest.headOption.foreach(t => assert(total + t > 5000L))
  }
}
