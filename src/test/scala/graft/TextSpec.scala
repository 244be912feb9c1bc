package graft

import graft.functions.{Text, Vectors}
import graft.llm.Dedup
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq("x").toDF("dummy").select(c).collect().head.get(0).asInstanceOf[T]

  test("tokenCount handles empty, blank and multi-space text") {
    val df = Seq("", "   ", "a  b\tc", "one").toDF("t")
    val out = df.select(Text.tokenCount(col("t"))).as[Int].collect()
    assert(out.toSeq == Seq(0, 0, 3, 1))
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq(("A  b c", "a b C")).toDF("x", "y")
    val r = df.select(
      (Text.fingerprint(col("x")) === Text.fingerprint(col("y"))).as("eq"))
      .as[Boolean].collect().head
    assert(r)
  }

  test("shingles builds distinct word n-grams") {
    val df = Seq("a b c d a b c d").toDF("t")
    val out = df.select(Text.shingles(col("t"), 3)).as[Seq[String]]
      .collect().head
    assert(out.toSet == Set("a b c", "b c d", "c d a", "d a b"))
  }

  test("stopword/punct ratios and quality are bounded and sane") {
    val df = Seq("the cat sat on the mat!!!").toDF("t")
    val r = df.select(
      Text.stopwordRatio(col("t")).as("s"),
      Text.punctRatio(col("t")).as("p"),
      Text.qualityScore(col("t")).as("q")).collect().head
    assert(r.getDouble(0) > 0.3 && r.getDouble(0) <= 0.5)
    assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 0.2)
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
  }

  test("languageId picks the language with most marker hits, und when none") {
    val df = Seq("the cat is on a mat", "el perro de la casa que ladra y",
      "xyz qrs").toDF("t")
    val out = df.select(Text.languageId(col("t"))).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "und"))
  }

  test("subwordTokens splits punctuation and digit runs") {
    val df = Seq("hello, world42!").toDF("t")
    val out = df.select(Text.subwordTokens(col("t"))).as[Seq[String]]
      .collect().head
    assert(out == Seq("hello", ",", "world", "42", "!"))
  }

  test("simhash: identical texts collide, different texts differ") {
    val df = Seq(("same text here", "same text here", "entirely other words"))
      .toDF("a", "b", "c")
    val r = df.select(Dedup.simhash(col("a")).as("ha"),
      Dedup.simhash(col("b")).as("hb"), Dedup.simhash(col("c")).as("hc"))
      .collect().head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
  }

  test("cosine similarity of known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(2.0f, 0.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Vectors.cosine(col("a"), col("b")).as("ab"),
      Vectors.cosine(col("a"), col("c")).as("ac")).collect().head
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("hyperplaneBucket: identical vectors share a bucket") {
    val planes = graft.llm.Similarity.planes(8, 3)
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f),
      Seq(-1.0f, -2.0f, -3.0f))).toDF("a", "b", "c")
    val r = df.select(
      Vectors.hyperplaneBucket(col("a"), planes).as("ba"),
      Vectors.hyperplaneBucket(col("b"), planes).as("bb"),
      Vectors.hyperplaneBucket(col("c"), planes).as("bc")).collect().head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
  }

  test("repetitionRatio: 0 for all-distinct, rises with repetition, 0 for empty") {
    val df = Seq("a b c d", "a a a b", "a a a a", "", "  ").toDF("t")
    val out = df.select(Text.repetitionRatio(col("t"))).as[Double].collect()
    assert(out.toSeq == Seq(0.0, 0.5, 0.75, 0.0, 0.0))
  }

  test("bigramScore interpolates bigram and unigram probabilities") {
    val df = Seq((0L, "a b a b"), (1L, "b a")).toDF("doc_id", "text")
    val out = graft.llm.LanguageModel.bigramScore(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "avg_logp")
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._2).toSeq == Seq(3L, 1L))
    // doc 1's only bigram (b,a): p_bi = 2/2, p_uni(a) = 2/4
    // -> ln(0.75*1 + 0.25*0.5) = ln(0.875)
    assert(math.abs(out(1)._3 -
      BigDecimal(math.log(0.875)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("kneserNeyBigramScore: discount + continuation back-off, hand-checked") {
    // corpus bigrams: (san,francisco) x3, (the,cat), (the,dog), (the,rat)
    // left:  san -> c1=3, n1f=1;  the -> c1=3, n1f=3
    // cont:  every w2 has n1b=1; n_types=4
    // p(francisco|san) = (3-.75)/3 + .75*(1/3)*(1/4) = 13/16
    // p(cat|the)       = (1-.75)/3 + .75*(3/3)*(1/4) = 13/48
    // KN's point: "francisco" is frequent but a ONE-context
    // continuation, so its back-off mass (1/4) is no larger than the
    // singletons' — the continuation distribution, not raw frequency
    val df = Seq(
      (0L, "san francisco"), (1L, "san francisco"), (2L, "san francisco"),
      (3L, "the cat"), (4L, "the dog"), (5L, "the rat"))
      .toDF("doc_id", "text")
    val out = graft.llm.LanguageModel.kneserNeyBigramScore(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "avg_logp")
      .as[(Long, Long, Double)].collect()
    graft.llm.LanguageModel.releaseCaches()
    assert(out.map(_._2).toSeq == Seq.fill(6)(1L))
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(0)._3 - r6(math.log(13.0 / 16))) < 1e-9)
    assert(math.abs(out(3)._3 - r6(math.log(13.0 / 48))) < 1e-9)
    // discount mass conservation: over w1="the", kept probability
    // (3 * (1-.75)/3) plus back-off mass (.75*3/3) is exactly 1 when
    // pcont sums to 1 over the vocab — spot-check the formula's terms
    assert(out(3)._3 == out(4)._3 && out(4)._3 == out(5)._3)
  }

  test("unigramScore: common-vocabulary docs outscore rare-vocabulary docs") {
    // "the cat" tokens dominate the corpus; doc 2's tokens are singletons
    val df = Seq(
      (0L, "the cat the cat the cat"),
      (1L, "the cat the cat"),
      (2L, "zyx qwv")).toDF("doc_id", "text")
    val out = graft.llm.LanguageModel.unigramScore(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "avg_logp")
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._2).toSeq == Seq(6L, 4L, 2L))
    // p(the) = p(cat) = 5/12; p(zyx) = p(qwv) = 1/12
    assert(math.abs(out(0)._3 - math.log(5.0 / 12)) < 1e-5)
    assert(math.abs(out(2)._3 - math.log(1.0 / 12)) < 1e-5)
    assert(out(0)._3 > out(2)._3)
  }

  test("pplBuckets stratifies per language; fluent docs land in head") {
    // en: six docs — four common-vocab (fluent), two singleton-vocab
    // (gibberish); fr: three docs ranked within fr only
    val df = Seq(
      (0L, "the cat sat", "en"), (1L, "the cat ran", "en"),
      (2L, "the cat sat", "en"), (3L, "the cat ran", "en"),
      (4L, "zq wvx yyj", "en"), (5L, "kpf hgd bbn", "en"),
      (10L, "le chat le chat", "fr"), (11L, "le chat dort", "fr"),
      (12L, "xqz wfv plj", "fr")).toDF("doc_id", "text", "lang")
    val out = graft.llm.LanguageModel
      .pplBuckets(df, "doc_id", "text", "lang")
      .as[(Long, String, Double, String)].collect()
      .map(r => r._1 -> (r._2, r._4)).toMap
    assert(out.size == 9)
    // gibberish docs are never head; the most fluent doc of each
    // language is head (percent_rank 0 < 1/3 always)
    assert(Seq(4L, 5L, 12L).forall(out(_)._2 != "head"))
    assert(out(12L) == ("fr", "tail"))
    assert(out.count { case (_, (l, b)) => l == "en" && b == "head" } >= 1)
    assert(out.count { case (_, (l, b)) => l == "fr" && b == "head" } >= 1)
    // buckets are language-local: every language has a head even though
    // fr scores are computed against the same shared corpus vocabulary
    val frBuckets = out.collect { case (_, ("fr", b)) => b }.toSet
    assert(frBuckets.contains("head") && frBuckets.contains("tail"))
  }

  test("termProximity: min cross-term distance via adjacent-pair window") {
    val d = Seq(
      (0L, "alpha beta gamma beta delta alpha"),  // alpha..delta: min |4-5|? see below
      (1L, "delta x x x alpha"),                  // distance 4
      (2L, "alpha only here"),                    // missing delta -> absent
      (3L, "delta delta alpha delta"))            // adjacent after: 1
      .toDF("doc_id", "text")
    val out = graft.llm.Relevance.termProximity(d, "doc_id", "text",
      "alpha", "delta").as[(Long, Long)].collect().toMap
    // doc 0: alpha@0,5 delta@4 -> min(|4-0|,|5-4|)=1
    assert(out == Map(0L -> 1L, 1L -> 4L, 3L -> 1L))
  }

  test("bestFitPacks: capacity respected, beats contiguous on padding") {
    // budget 10; sizes desc 7,5,4,3,2,2 — BFD: 7→p0, 5→p1, 4→p1(9),
    // 3→p0(10), 2→p2 (no fit in 10/9), 2→p2(4): loads {10,9,4}
    val df = Seq((1L, 7L), (2L, 5L), (3L, 4L), (4L, 3L), (5L, 2L), (6L, 2L))
      .toDF("doc_id", "n_tokens").withColumn("shard", lit(0))
    val out = graft.llm.Packing.bestFitPacks(df, "doc_id", "n_tokens",
      10L, "shard").as[(Int, Long, Long, Long)].collect()
    val byPack = out.groupBy(_._4).view
      .mapValues(_.map(r => r._2 -> r._3)).toMap
    assert(byPack.size == 3, s"expected 3 packs: $byPack")
    byPack.values.foreach(p => assert(p.map(_._2).sum <= 10L, s"$byPack"))
    assert(byPack.values.map(_.map(_._2).sum).toSeq.sorted == Seq(4L, 9L, 10L))
    // oversize doc gets its own pack; zero never overflows
    val big = Seq((1L, 25L), (2L, 3L)).toDF("doc_id", "n_tokens")
      .withColumn("shard", lit(0))
    val ob = graft.llm.Packing.bestFitPacks(big, "doc_id", "n_tokens",
      10L, "shard").as[(Int, Long, Long, Long)].collect()
      .map(r => r._2 -> r._4).toMap
    assert(ob(1L) != ob(2L))
    // determinism under physical layout
    val again = graft.llm.Packing.bestFitPacks(df.repartition(5), "doc_id",
      "n_tokens", 10L, "shard").as[(Int, Long, Long, Long)].collect()
    assert(again.sortBy(_._2).toSeq == out.sortBy(_._2).toSeq)
    // efficiency gate vs contiguous on a skewed fixture: BFD never uses
    // more packs
    val mix = (1L to 60L).map(i => (i, 1L + (i * 37) % 9))
      .toDF("doc_id", "n_tokens").withColumn("shard", (col("doc_id") % 2).cast("int"))
    val bfd = graft.llm.Packing.bestFitPacks(mix, "doc_id", "n_tokens",
      10L, "shard").select("shard", "pack_id").distinct().count()
    val contig = graft.llm.Packing.contiguousPacks(mix, "n_tokens", 10L,
      Seq(col("doc_id")), Some("shard"))
      .select("shard", "pack_id").distinct().count()
    assert(bfd <= contig, s"BFD $bfd packs vs contiguous $contig")
  }

  test("rrfFuse sums reciprocal ranks; consensus docs beat one-list hits") {
    // list A ranks (1,2,3) = docs 10,20,30; list B ranks docs 20,10,40:
    // doc 20: 1/62 + 1/61, doc 10: 1/61 + 1/62 (tie!), 30: 1/63, 40: 1/63
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val out = graft.llm.Relevance.rrfFuse(Seq(a, b))
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val r12 = BigDecimal(1.0 / 61 + 1.0 / 62)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r3 = BigDecimal(1.0 / 63)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(10L) == (r12, 2L) && out(20L) == (r12, 2L))
    assert(out(30L) == (r3, 1L) && out(40L) == (r3, 1L))
    // consensus (both lists) dominates single-list presence
    assert(out(10L)._1 > out(30L)._1)
    // topN keeps the best by (score desc, id) — the score tie between
    // 10 and 20 breaks toward the smaller id
    val top = graft.llm.Relevance.rrfFuse(Seq(a, b), topN = 3)
      .as[(Long, Double, Long)].collect().map(_._1)
    assert(top.take(2).toSeq == Seq(10L, 20L))
  }

  test("chunkDocuments: overlapping windows, capped tail, no empty docs") {
    val df = Seq(
      (1L, "a b c d e f g"),   // 7 tokens
      (2L, "X y"),             // shorter than one chunk; mixed case
      (3L, "   "))             // zero tokens -> no chunks
      .toDF("doc_id", "text")
    val out = graft.llm.Packing.chunkDocuments(df, "doc_id", "text", 3, 2)
      .orderBy("doc_id", "chunk_index")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0, 3, "a b c"),
      (1L, 1, 3, "c d e"),
      (1L, 2, 3, "e f g"),
      (1L, 3, 1, "g"),        // tail chunk starts inside the doc, capped
      (2L, 0, 2, "X y")))      // payload text: case preserved, not folded
    // map-only: chunking must not shuffle
    val plan = graft.llm.Packing.chunkDocuments(df, "doc_id", "text", 3, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must be map-only:\n$plan")
  }

  test("distinctiveTerms: class-unique vocabulary outranks shared filler") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      ("sports", "the game the match the goal"),
      ("sports", "the game again"),
      ("finance", "the market the bond the rates"),
      ("finance", "the market closes")).toDF("cls", "text")
    val out = graft.llm.Relevance.distinctiveTerms(docs, "cls", "text", 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(3)))
    val top = out.filter(_._3 == 1).map(t => t._1 -> t._2).toMap
    // the class-exclusive repeated term outranks the corpus-dominant
    // shared filler: ln damps "the" (f=8) to 4·ln(1+9/8)=3.02 below
    // game/market 2·ln(1+9/2)=3.41
    assert(top("sports") == "game" && top("finance") == "market", top)
    // exactly k rows per class, ranks 1..k
    assert(out.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._3).sorted.toSeq == Seq(1, 2) })
  }
}
