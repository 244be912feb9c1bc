package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions: the scale posture claimed in README is
  * checked here, not just eyeballed — filters reach the parquet scan,
  * schemas are pruned, dims broadcast, top-k avoids a global sort.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters and column pruning reach the parquet scan") {
    val df = SparkEntry.queries("q_scan_filter")(spark, sf)
    val plan = planOf(df)
    // the toString truncates PushedFilters, so assert on the prefix and
    // on the scan's (untruncated) output column list for pruning
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"expected filters pushed to scan:\n$plan")
    assert(plan.contains("FileScan parquet [l_orderkey"), plan)
    assert(!plan.contains("l_tax#"), "unused columns must be pruned")
  }

  test("round-9 OLAP suite: dims and scalar gates broadcast, anti join is anti") {
    val ms = planOf(SparkEntry.queries("q_market_share")(spark, sf))
    assert(ms.contains("BroadcastHashJoin"), ms)
    assert(!ms.contains("CartesianProduct"), ms)
    // the per-part cap frame must come back as a broadcast, not a
    // second fact-side shuffle
    val ay = planOf(SparkEntry.queries("q_avg_yearly")(spark, sf))
    assert(ay.contains("BroadcastHashJoin"), ay)
    val ic = planOf(SparkEntry.queries("q_idle_customers")(spark, sf))
    assert(ic.contains("LeftAnti"), ic)
  }

  test("dimension joins broadcast, fact side does not") {
    val df = SparkEntry.queries("q_join_region_revenue")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val df = SparkEntry.queries("q_topk_customers")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("grouped aggregates are partial+final (map-side combine)") {
    val df = SparkEntry.queries("q_pricing_summary")(spark, sf)
    val plan = planOf(df)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_sum") || plan.contains("partial"), plan)
  }

  test("whole-stage codegen covers the hot projection pipeline") {
    val df = SparkEntry.queries("q_quality_score")(spark, sf)
    // "*(n)" prefixes mark WholeStageCodegen stages in executedPlan text
    val plan = planOf(df)
    assert(plan.contains("*(1)"), plan)
  }

  test("windowed agg with watermark keeps streaming-compatible shape") {
    val events = Tables.load(spark, sf, "events")
    // same plan combinator used by the streaming path, batch-planned:
    val df = graft.operators.Aggregates.timeBucketAgg(
      "ts", "10 minutes", Seq("event_type"),
      Seq(count(lit(1)).as("n")))(events)
    val plan = planOf(df)
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("banding near-dup ops are bucket-combine, not self-joins") {
    // the signature pipeline must be evaluated once: a self-join shape
    // pays it per side (AQE does not reuse alias-twin exchanges)
    val docs = Tables.load(spark, sf, "documents")
    val sim = planOf(graft.llm.Dedup.simhashNearDups(docs, "doc_id", "text", 6))
    assert(!sim.contains("Join"), s"simhashNearDups must not join:\n$sim")
    assert("simhash64".r.findAllIn(sim).size <= 1,
      s"simhash kernel should appear once:\n$sim")
    val lsh = planOf(graft.llm.Dedup.lshCandidates(docs, "doc_id", "text"))
    assert(!lsh.contains("Join"), s"lshCandidates must not join:\n$lsh")
  }

  test("knnLabelAgreement never broadcasts the corpus-side label frame") {
    // the neighbor-side label frame is corpus-sized: it must attach via
    // a shuffle join; only query-derived frames may carry a broadcast
    // hint (corpus-sized broadcast = driver OOM at billion-row corpora)
    val emb = Tables.load(spark, sf, "embeddings")
    val out = graft.llm.Similarity.knnLabelAgreement(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", "label", 3)
    val hints = out.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.nonEmpty, "query-side broadcasts expected")
    hints.foreach { h =>
      assert(!h.output.map(_.name).contains("n_label"),
        s"corpus-side label frame must not be hinted broadcast:\n$h")
      assert(!h.output.map(_.name).contains("cv"),
        s"corpus vector side must not be hinted broadcast:\n$h")
    }
  }

  test("round-4 operators plan without cartesian products") {
    val emb = Tables.load(spark, sf, "embeddings")
    val docs = Tables.load(spark, sf, "documents")
    val sd = planOf(graft.llm.Dedup.semanticDedup(
      emb, "vec_id", "embedding", 0.9, 4))
    assert(!sd.contains("CartesianProduct"), sd)
    graft.llm.Dedup.releaseCaches()
    val inc = planOf(graft.llm.Dedup.incrementalDedup(
      docs.filter(col("doc_id") >= 400), docs.filter(col("doc_id") < 400),
      "doc_id", "text"))
    assert(!inc.contains("CartesianProduct"), inc)
    graft.llm.Dedup.releaseCaches()
    val end = planOf(graft.llm.Dedup.embeddingNearDups(
      emb, "vec_id", "embedding", 0.9))
    assert(!end.contains("CartesianProduct"), end)
  }

  test("mixing family: broadcast rates/vocab, no single-partition sort") {
    val docs = Tables.load(spark, sf, "documents")
    // temperature resample: the per-stratum rate frame broadcasts into
    // the scan side — never a shuffled (hash-hash) corpus join
    val tr = planOf(graft.llm.Mixing.temperatureResample(
      docs, "source", col("doc_id"), 0.3, 0.5))
    assert(tr.contains("BroadcastHashJoin"), tr)
    // OOV coverage: vocab cut is TakeOrdered (no global sort of the
    // token stream) and the coverage attach broadcasts the vocab
    val oov = planOf(graft.llm.Mixing.oovRate(docs, "text", "lang", 15))
    assert(oov.contains("TakeOrderedAndProject"), oov)
    assert(oov.contains("BroadcastHashJoin"), oov)
    // token-budget selection: the ordered running sum must be a window
    // PARTITIONED by the boundary quality value — the naive form's
    // Exchange SinglePartition is exactly what the two-phase plan kills
    val tb = planOf(graft.llm.Mixing.tokenBudgetSelect(
      docs, "text", "doc_id", 5000L))
    assert(!tb.contains("SinglePartition"), tb)
    graft.llm.Mixing.releaseCaches()
    // sharded shuffle: per-shard windows hash-partition on shard;
    // no single-partition global sort anywhere in the plan
    val ss = planOf(graft.llm.Mixing.shuffleShards(
      docs.select("doc_id"), col("doc_id"), 8))
    assert(ss.contains("hashpartitioning(shard"), ss)
    assert(!ss.contains("SinglePartition"), ss)
  }

  test("round-5 operators: para dedup explodes once, ppl windows per-lang") {
    val docs = Tables.load(spark, sf, "documents")
    // dedupParagraphs: the ONLY explode is the text-free fingerprint
    // projection — the rewrite is an index-filtered HOF on the
    // un-exploded corpus, so there is no explode→reassemble round trip
    val pd = planOf(graft.llm.Lines.dedupParagraphs(
      docs, "doc_id", "text", sep = "\n"))
    assert("Generate posexplode".r.findAllIn(pd).size == 1,
      s"expected exactly one explode (fingerprint projection):\n$pd")
    assert(!pd.contains("CartesianProduct"), pd)
    assert(!pd.contains("Exchange SinglePartition"), pd)
    // pplBuckets: ranking window partitions BY language (parallel per
    // lang), never a single-partition global sort
    // mean-pool: per-dimension partial aggregation must be map-side
    // combined (vectors never ride the shuffle whole)
    val mp = planOf(graft.llm.Similarity.meanPoolEmbeddings(
      Tables.load(spark, sf, "embeddings")
        .select((col("vec_id") / 10).cast("long").as("g"), col("embedding")),
      "g", "embedding"))
    assert(mp.contains("partial_avg") || mp.contains("partial"), mp)
    assert(!mp.contains("CartesianProduct"), mp)
    // term proximity: the lag window partitions by doc id — parallel,
    // and its input is the two terms' occurrence rows only
    val tp = planOf(graft.llm.Relevance.termProximity(
      docs, "doc_id", "text", "vector", "join"))
    assert(tp.contains("hashpartitioning(id"), tp)
    assert(!"Sort \\[[^\\n]*\\], true".r.findFirstIn(tp).isDefined, tp)
    // span-decontamination screen: the corpus pass must be map-only
    // (bloom literal + array HOFs — streaming-legal by construction)
    val bloom = graft.llm.Dedup.spanBloom(
      docs.filter(col("doc_id") < 5), "doc_id", "text", 13)
    val scr = planOf(graft.llm.Dedup.decontaminateSpansScreen(
      docs, "doc_id", "text", bloom, 13))
    assert(!scr.contains("Exchange"),
      s"span screen must not shuffle:\n$scr")
    val pb = planOf(graft.llm.LanguageModel.pplBuckets(
      docs, "doc_id", "text", "lang"))
    assert(pb.contains("hashpartitioning(lang"), pb)
    // the ranking sort must be window-local (", false" = non-global);
    // the only SinglePartition allowed is the 1-row scalar total
    assert(!"Sort \\[[^\\n]*\\], true".r.findFirstIn(pb).isDefined,
      s"no global sort expected:\n$pb")
    graft.llm.LanguageModel.releaseCaches()
  }

  test("single-pass corr matrix: one aggregate, no RDD detour") {
    val li = Tables.load(spark, sf, "lineitem")
    val df = li.agg(corr(col("l_quantity"), col("l_extendedprice")))
    assert(planOf(df).contains("HashAggregate"))
    // corrMatrix itself returns a local frame; assert it computes
    // correct values against the two-column direct corr
    val m = graft.operators.Aggregates.corrMatrix(
      Seq("l_quantity", "l_extendedprice"))(li).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val direct = li.agg(corr(col("l_quantity"), col("l_extendedprice")))
      .head().getDouble(0)
    assert(m(("l_quantity", "l_quantity")) == 1.0)
    assert(math.abs(m(("l_quantity", "l_extendedprice")) - direct) < 1e-6)
  }

  test("softDedupWeights: text never rides the window exchange") {
    val df = SparkEntry.queries("q_soft_dedup")(spark, sf)
    val plan = planOf(df)
    // the Exchange hashpartitions on the md5 fingerprint; the raw text
    // column must be projected away BEFORE it — the Project feeding
    // the exchange OUTPUTS only (doc_id, fingerprint); text appears
    // inside the md5 expression, never as an output column
    assert(plan.contains("Exchange hashpartitioning(fingerprint"), plan)
    // precise check on the exchange INPUT schema, not the plan string:
    // every shuffle's child may output only small fixed-width columns
    val root = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan // post-EnsureRequirements: exchanges are in place
      case p => p
    }
    val exchanges = root.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, plan)
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name)
      assert(!cols.contains("text"),
        s"text crossed a shuffle: exchange input = $cols")
    }
  }

  test("quantized and PQ kNN broadcast the query side, never shuffle vectors") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val quant = graft.llm.Similarity.quantizedKnn(q, emb, "vec_id",
      "embedding", 5)
    val qp = planOf(quant)
    assert(qp.contains("BroadcastNestedLoopJoin"), qp)
    assert(!qp.contains("SortMergeJoin") && !qp.contains("CartesianProduct"), qp)
    // a MATERIALIZED PQ index serves searches from (id, code) cache
    // blocks — the float vectors are read once at build, never per
    // search (the build-once/search-many contract)
    val pq = graft.llm.Similarity.buildPq(emb, "vec_id", "embedding",
      m = 16, ksub = 256)
    pq.encoded.count() // materialize the index
    val pqPlan = planOf(graft.llm.Similarity.pqKnn(q, pq, "vec_id",
      "embedding", 5))
    assert(pqPlan.contains("BroadcastNestedLoopJoin"), pqPlan)
    assert(pqPlan.contains("InMemoryTableScan"),
      s"search must read the cached index:\n$pqPlan")
    val joinIdx = pqPlan.indexOf("BroadcastNestedLoopJoin")
    val corpusSide = pqPlan.substring(joinIdx)
    assert(corpusSide.linesIterator.exists(l =>
        l.contains("InMemoryTableScan") && !l.contains("embedding#")),
      s"ADC scan must read codes, not float vectors:\n$corpusSide")
    pq.encoded.unpersist(blocking = true)
  }

  test("ivfPqKnn corpus join is an equi-join on list_id carrying codes only") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val coarse = graft.llm.Similarity.buildIvf(emb, "vec_id", "embedding",
      nlist = 16)
    val pq = graft.llm.Similarity.buildPq(emb, "vec_id", "embedding",
      m = 16, ksub = 256)
    val plan = planOf(graft.llm.Similarity.ivfPqKnn(q, coarse, pq,
      "vec_id", "embedding", 5, nProbe = 4))
    // candidate pruning is an equi-join (hash or sort-merge), never a
    // nested loop over the whole corpus
    assert(plan.contains("list_id"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    coarse.indexed.unpersist(blocking = true)
    pq.encoded.unpersist(blocking = true)
  }

  test("unigram encode is one codegen projection: no object-serde boundary") {
    // the r7 kernel exists precisely to remove the typed-map encoder
    // round-trip; a regression reintroducing it shows up as
    // Serialize/DeserializeToObject nodes (and a MapElements) in the plan
    val docs = Tables.load(spark, sf, "documents")
    val vocab = graft.llm.Unigram.train(docs, "text", vocabSize = 200,
      iters = 1, maxPieceLen = 4, seedSize = 500)
    graft.llm.Unigram.releaseCaches()
    val plan = planOf(
      graft.llm.Unigram.encodeDocs(docs, "doc_id", "text", vocab))
    assert(!plan.contains("DeserializeToObject") &&
      !plan.contains("SerializeFromObject") &&
      !plan.contains("MapElements"),
      s"encoder boundary reintroduced:\n$plan")
    assert(plan.contains("unigram_encode_stats"), plan)
    assert(!plan.contains("Exchange"), s"encode pass must be map-only:\n$plan")
  }

  test("approx-percentile gate broadcasts the melted sketch side") {
    val plan = planOf(
      SparkEntry.queries("q_approx_percentiles")(spark, sf))
    // the 12-row melted approx table must broadcast against lineitem,
    // never shuffle the fact side for the join
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("compiled BPE merge application is map-only over the word table") {
    val docs = Tables.load(spark, sf, "documents")
    val merges = graft.llm.Bpe.train(docs, "text", 6, minCount = 2L)
      .map(m => (m._1, m._2))
    val words = graft.llm.Bpe.initSymbols(
      graft.llm.Bpe.wordFreq(docs, "text"))
    val df = words.withColumn("symbols",
      graft.plans.BpeChunk.applyMerges(col("symbols"), merges))
    // the kernel collapses INTO the word-table aggregate's result
    // projection (no extra stage), so its pretty name only shows in the
    // logical plan; the physical assert is on stage/boundary count
    assert(df.queryExecution.analyzed.toString.contains("bpe_apply_merges"),
      df.queryExecution.analyzed.toString)
    val plan = planOf(df)
    // one aggregation exchange builds the word table; the merge
    // application itself adds NO further exchange or serde boundary
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
    assert(!plan.contains("DeserializeToObject"), plan)
  }
}
