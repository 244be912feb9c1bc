package graft

import graft.llm.{Dedup, Lines}
import org.apache.spark.sql.functions._

/** Line-level cleaning (C4-style boilerplate / heuristics) and
  * substring-level dedup (repeated token spans, Lee et al. shape). */
class LinesSpansSpec extends SparkSpec {
  import spark.implicits._

  // three docs sharing a cookie banner + a nav line; distinct bodies
  private val docs = Seq(
    (0L, "We use cookies on this site.\nHome | About | Contact\nAlpha article body one with real content here.\nMore alpha prose follows."),
    (1L, "We use cookies on this site.\nHome | About | Contact\nBeta article body two, entirely different text."),
    (2L, "We use cookies on this site.\nGamma body three stands alone.\nShort.\n"),
    (3L, "Unique document with no shared lines at all.\nJust content."))
    .toDF("doc_id", "text")

  test("lineDocFreq counts distinct-doc frequency per exact line") {
    val freq = Lines.lineDocFreq(docs, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(freq("We use cookies on this site.") == 3L)
    assert(freq("Home | About | Contact") == 2L)
    assert(freq("Just content.") == 1L)
    // a line repeated within one doc counts once (distinct docs)
    val rep = Seq((10L, "x\nx\nx")).toDF("doc_id", "text")
    val f2 = Lines.lineDocFreq(rep, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(f2("x") == 1L)
  }

  test("stripBoilerplate removes frequent lines, keeps order, counts drops") {
    val out = Lines.stripBoilerplate(docs, "doc_id", "text", minDocFreq = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0L)._2 ==
      "Alpha article body one with real content here.\nMore alpha prose follows.")
    assert(out(0L)._3 == 2L && out(0L)._4 == 2L)
    assert(out(1L)._2 == "Beta article body two, entirely different text.")
    assert(out(3L)._2 == "Unique document with no shared lines at all.\nJust content.")
    assert(out(3L)._4 == 0L)
    // doc that is ALL boilerplate comes back empty, not missing
    val all = Seq((20L, "same\nsame2"), (21L, "same\nsame2")).toDF("doc_id", "text")
    val stripped = Lines.stripBoilerplate(all, "doc_id", "text", 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(stripped(20L)._2 == "" && stripped(20L)._3 == 0L && stripped(20L)._4 == 2L)
  }

  test("line matching is byte-exact: case variants are distinct lines") {
    // C4 semantics — "Cookie Policy" and "cookie policy" must NOT merge
    val d = Seq(
      (0L, "Cookie Policy\nbody zero"),
      (1L, "cookie policy\nbody one"),
      (2L, "Cookie Policy\nbody two")).toDF("doc_id", "text")
    val freq = Lines.lineDocFreq(d, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(freq("Cookie Policy") == 2L && freq("cookie policy") == 1L)
    val out = Lines.stripBoilerplate(d, "doc_id", "text", 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._2 == "body zero")        // frequent variant stripped
    assert(out(1L)._2 == "cookie policy\nbody one") // rare variant kept
    // screen agrees: bloom is built from the byte-exact line set
    val screen = Lines.stripBoilerplateScreen(d, "doc_id", "text", 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(screen == out)
  }

  test("stripBoilerplateScreen agrees with exact strip on a no-collision corpus") {
    val exact = Lines.stripBoilerplate(docs, "doc_id", "text", 2)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    val screen = Lines.stripBoilerplateScreen(docs, "doc_id", "text", 2)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(screen == exact) // tiny corpus: bloom fp-rate ~0
  }

  test("stripBoilerplateScreen is map-only (no Exchange on the corpus pass)") {
    // phase 1 (frequent-line agg) runs eagerly at plan build; the
    // returned frame's own plan must not shuffle the corpus
    val plan = Lines.stripBoilerplateScreen(docs, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"corpus pass should be map-only:\n$plan")
  }

  test("boilerplate bloom fitted on batch applies to a live stream (parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // fit on the batch reference corpus...
    val bloom = Lines.boilerplateBloom(docs, "doc_id", "text", 2)
    // ...apply at ingest on a live stream of fresh docs
    val incoming = Seq(
      (100L, "We use cookies on this site.\nFresh article about streams."),
      (101L, "No boilerplate in this one.\nJust body text."))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamed = Lines.applyBoilerplateBloom(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", bloom)
    val q = streamed.writeStream.format("memory")
      .queryName("line_screen_out").outputMode("append").start()
    try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
      val got = spark.table("line_screen_out")
        .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
      val want = Lines.applyBoilerplateBloom(
        incoming.toDF("doc_id", "text"), "doc_id", "text", bloom)
        .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
      assert(got == want)
      assert(got(100L)._2 == "Fresh article about streams.")
      assert(got(101L)._4 == 0L)
    } finally q.stop()
  }

  test("dedupParagraphs keeps the first occurrence, drops all later ones") {
    // para "shared passage" appears in docs 0 (pos 1), 1 (pos 0), and
    // twice in doc 2 — only doc 0 pos 1 survives (smallest doc wins;
    // within doc 2 even the earlier copy loses to doc 0's)
    val d = Seq(
      (0L, "alpha one\n\nshared passage\n\nalpha two"),
      (1L, "shared passage\n\nbeta body"),
      (2L, "shared passage\n\ngamma\n\nshared passage"))
      .toDF("doc_id", "text")
    val out = Lines.dedupParagraphs(d, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._2 == "alpha one\n\nshared passage\n\nalpha two")
    assert(out(0L)._3 == 3L && out(0L)._4 == 0L)
    assert(out(1L)._2 == "beta body")
    assert(out(1L)._3 == 1L && out(1L)._4 == 1L)
    assert(out(2L)._2 == "gamma")
    assert(out(2L)._3 == 1L && out(2L)._4 == 2L)
  }

  test("dedupParagraphs: all-duplicate doc comes back empty, not missing") {
    val d = Seq(
      (0L, "only passage"),
      (5L, "only passage")).toDF("doc_id", "text")
    val out = Lines.dedupParagraphs(d, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._2 == "only passage" && out(0L)._3 == 1L)
    assert(out(5L)._2 == "" && out(5L)._3 == 0L && out(5L)._4 == 1L)
  }

  test("dedupParagraphs vs stripBoilerplate: keep-one vs remove-all") {
    // the same corpus, the two semantics differ exactly on the
    // canonical occurrence: strip removes it, dedup keeps it
    val d = Seq(
      (0L, "dup line\nunique zero"),
      (1L, "dup line\nunique one")).toDF("doc_id", "text")
    val strip = Lines.stripBoilerplate(d, "doc_id", "text", 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val dedup = Lines.dedupParagraphs(d, "doc_id", "text", sep = "\n")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(strip(0L) == "unique zero" && dedup(0L) == "dup line\nunique zero")
    assert(strip(1L) == "unique one" && dedup(1L) == "unique one")
  }

  test("c4LineFilter applies word-count, punctuation, and blocklist rules") {
    val d = Seq(
      (0L, "This line is long enough and ends well.\nshort one\nThis one mentions javascript code here.\nNo terminal punctuation on this line"))
      .toDF("doc_id", "text")
    val strict = Lines.c4LineFilter(d, "doc_id", "text", minWords = 3,
      requireTerminalPunct = true, blocklist = Seq("javascript"))
      .as[(Long, String, Long, Long)].collect().head
    assert(strict._2 == "This line is long enough and ends well.")
    assert(strict._3 == 1L && strict._4 == 3L)
    val lax = Lines.c4LineFilter(d, "doc_id", "text", minWords = 3,
      requireTerminalPunct = false, blocklist = Seq("javascript"))
      .as[(Long, String, Long, Long)].collect().head
    assert(lax._2 ==
      "This line is long enough and ends well.\nNo terminal punctuation on this line")
  }

  test("repeatedSpans finds the planted cross-doc span with exact bounds") {
    val shared = (1 to 30).map(i => s"s$i").mkString(" ")
    val d = Seq(
      (0L, s"a1 a2 a3 $shared b1 b2 b3"),            // span at tokens 4..33
      (1L, s"$shared c1 c2 c3 c4 c5 c6 c7 c8 c9"),   // span at tokens 1..30
      (2L, (1 to 40).map(i => s"u$i").mkString(" "))) // no duplication
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(d, "doc_id", "text", n = 10)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(spans == Set((0L, 4, 33, 30), (1L, 1, 30, 30)))
  }

  test("repeatedSpans counts within-doc repetition (multiplicity, not doc freq)") {
    val rep = (1 to 12).map(i => s"r$i").mkString(" ")
    val d = Seq((0L, s"$rep x1 x2 x3 $rep")).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(d, "doc_id", "text", n = 12)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(spans == Set((0L, 1, 12, 12), (0L, 16, 27, 12)))
  }

  test("removeRepeatedSpans keeps exactly one occurrence corpus-wide") {
    val shared = (1 to 30).map(i => s"s$i").mkString(" ")
    val d = Seq(
      (0L, s"a1 a2 a3 $shared b1 b2 b3"),
      (1L, s"$shared c1 c2 c3 c4 c5 c6 c7 c8 c9"),
      (2L, (1 to 40).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(d, "doc_id", "text", n = 10)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // keeper is the globally-min (id, pos): doc 0 keeps its copy
    assert(out(0L)._2 == s"a1 a2 a3 $shared b1 b2 b3" && out(0L)._4 == 0L)
    assert(out(1L)._2 == "c1 c2 c3 c4 c5 c6 c7 c8 c9" && out(1L)._4 == 30L)
    assert(out(2L)._4 == 0L)
    // corpus-wide: exactly one copy of the span text survives
    val kept = out.values.map(_._2).mkString("\n")
    assert(kept.indexOf(shared) == kept.lastIndexOf(shared) && kept.contains(shared))
  }

  test("decontaminateSpans excises every test window from train docs") {
    // the 5-gram "one two three four five" sits inside a train doc and
    // a test doc; unlike removeRepeatedSpans there is NO keeper — the
    // train occurrence is removed outright
    val train = Seq(
      (100L, "aa bb one two three four five cc dd"),
      (101L, "totally clean doc with nothing shared here at all"))
      .toDF("doc_id", "text")
    val test = Seq(
      (0L, "xx one two three four five yy")).toDF("doc_id", "text")
    val out = Dedup.decontaminateSpans(train, test, "doc_id", "text", 5)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(100L)._2 == "aa bb cc dd")
    assert(out(100L)._3 == 4L && out(100L)._4 == 5L)
    assert(out(101L)._2 ==
      "totally clean doc with nothing shared here at all")
    assert(out(101L)._4 == 0L)
    // a train doc that is ENTIRELY test material comes back empty
    val all = Seq((200L, "one two three four five")).toDF("doc_id", "text")
    val o2 = Dedup.decontaminateSpans(all, test, "doc_id", "text", 5)
      .as[(Long, String, Long, Long)].collect().head
    assert(o2._2 == "" && o2._3 == 0L && o2._4 == 5L)
  }

  test("decontaminateSpansScreen == exact form; runs on a live stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val test = Seq((0L, "xx one two three four five yy"))
      .toDF("doc_id", "text")
    val train = Seq(
      (100L, "aa bb one two three four five cc dd"),
      (101L, "totally clean doc with nothing shared here at all"),
      (102L, "one two three four five"))
    // screen == exact on this no-collision corpus
    val bloom = Dedup.spanBloom(test, "doc_id", "text", 5)
    val exact = Dedup.decontaminateSpans(train.toDF("doc_id", "text"),
        test, "doc_id", "text", 5)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    val screen = Dedup.decontaminateSpansScreen(train.toDF("doc_id", "text"),
        "doc_id", "text", bloom, 5)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(screen == exact)
    assert(screen(100L)._2 == "aa bb cc dd" && screen(102L)._2 == "")
    // the same screen runs unchanged on a live stream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Dedup.decontaminateSpansScreen(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", bloom, 5)
      .writeStream.format("memory")
      .queryName("span_screen_out").outputMode("append").start()
    try {
      mem.addData(train: _*)
      q.processAllAvailable()
      val got = spark.table("span_screen_out")
        .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
      assert(got == exact)
    } finally q.stop()
  }

  test("prepare composes line cleaning and span dedup before doc dedup") {
    val span = (1 to 20).map(i => s"sp$i").mkString(" ")
    val d = Seq(
      (0L, s"We use cookies here today folks.\nalpha body ${(1 to 30).map(i => s"a$i").mkString(" ")}"),
      (1L, s"We use cookies here today folks.\nbeta body ${(1 to 30).map(i => s"b$i").mkString(" ")}"),
      (2L, s"gamma opening text\n$span gamma tail one two three"),
      (3L, s"delta opening text\n$span delta tail four five six"),
      (4L, "We use cookies here today folks.")) // boilerplate-only page
      .toDF("doc_id", "text").withColumn("source", lit("web"))
    val out = graft.llm.CorpusPipeline.prepare(d, "doc_id", "text",
      cfg = graft.llm.CorpusPipeline.Config(
        boilerplateMinDocFreq = Some(3), spanDedupN = Some(10)))
    val byId = out.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(!byId.contains(4L))                    // emptied page dropped
    assert(!byId(0L).contains("cookies"))         // boilerplate stripped
    assert(byId(0L).contains("alpha body"))
    // the shared span survives in exactly one of docs 2/3
    val spanCount = Seq(2L, 3L).count(i => byId(i).contains(span))
    assert(spanCount == 1, byId.toString)
    assert(byId(2L).contains("gamma") && byId(3L).contains("delta"))
  }

  test("prepare: paragraph-dedup stage and leakage-safe split options") {
    val para = (1 to 15).map(i => s"p$i").mkString(" ")
    val nearA = (1 to 25).map(i => s"w$i").mkString(" ")
    val nearB = (1 to 24).map(i => s"w$i").mkString(" ") + " zz"
    val d = Seq(
      (0L, s"$para\nalpha ${(1 to 30).map(i => s"a$i").mkString(" ")}"),
      (1L, s"$para\nbeta ${(1 to 30).map(i => s"b$i").mkString(" ")}"),
      (2L, s"unique gamma $nearA"),
      (3L, s"unique gamma $nearB")) // near-dup of 2, below dedup cut
      .toDF("doc_id", "text").withColumn("source", lit("web"))
    val out = graft.llm.CorpusPipeline.prepare(d, "doc_id", "text",
      cfg = graft.llm.CorpusPipeline.Config(
        paraDedupSep = Some("\n"),
        leakageSafeMinJaccard = Some(0.5)))
    val text = out.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    // the shared paragraph survives only in doc 0 (keep-first)
    assert(text(0L).contains(para) && !text(1L).contains(para))
    // near-dups 2/3 survive doc-level dedup (jaccard < its 0.7 bar for
    // clustering at default bands is possible, but the leakage-safe
    // split must still co-bucket whatever near-dups remain)
    val buckets = out.select("doc_id", "split_bucket")
      .as[(Long, Long)].collect().toMap
    if (buckets.contains(2L) && buckets.contains(3L))
      assert(buckets(2L) == buckets(3L),
        s"near-dups straddle the split: $buckets")
  }

  test("maxOcc valve ignores ubiquitous n-grams") {
    val stop = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = (0L to 5L).map(i => (i, s"$stop tail$i")).toDF("doc_id", "text")
    // occ=6 above valve -> no spans at all
    val spans = Dedup.repeatedSpans(d, "doc_id", "text", n = 10,
      minOcc = 2, maxOcc = 5)
    assert(spans.count() == 0L)
  }
}
