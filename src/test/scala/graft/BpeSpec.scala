package graft

import graft.llm.Bpe
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Distributed BPE training vs an in-memory reference implementation. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE (Sennrich alg. 1): same greedy left-to-right merge,
    * same (count desc, left, right) tie-break. */
  private def refBpe(words: Map[String, Long], numMerges: Int,
      minCount: Long): Seq[(String, String, Long)] = {
    var tbl: Vector[(Vector[String], Long)] = words.toVector
      .map { case (w, f) => (w.split("").toVector :+ "</w>", f) }
    val out = Vector.newBuilder[(String, String, Long)]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= minCount =>
          out += ((a, b, c))
          tbl = tbl.map { case (syms, f) =>
            (syms.foldLeft(Vector.empty[String]) { (acc, x) =>
              if (acc.nonEmpty && acc.last == a && x == b)
                acc.init :+ (a + b)
              else acc :+ x
            }, f)
          }
          i += 1
        case _ => done = true
      }
    }
    out.result()
  }

  private val corpus = Seq(
    (0L, "low low low low low lower lower newest newest"),
    (1L, "newest newest newest newest widest widest widest new new"))
    .toDF("doc_id", "text")

  private def corpusWords: Map[String, Long] =
    corpus.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap

  test("mergePair merges greedily left-to-right, handling overlaps") {
    val df = Seq(Seq("a", "a", "a", "a"), Seq("x", "a", "a", "y"),
      Seq("a"), Seq.empty[String]).toDF("s")
    val out = df.select(Bpe.mergePair(col("s"), "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("aa", "aa"), Seq("x", "aa", "y"),
      Seq("a"), Seq.empty))
  }

  test("kernel applyMerges == layer-per-merge fold, incl. rank-order traps") {
    // chained merges, overlap runs, symbols outside every merge, and
    // the SEQUENTIAL-semantics trap: ("x","ab") ranks BEFORE ("a","b"),
    // so by the time "ab" exists its consumer has already passed — a
    // min-rank-loop encoder would merge [x,a,b] all the way to [xab];
    // rank-order application must stop at [x, ab]
    val merges = Seq(("x", "ab"), ("a", "b"), ("ab", "c"), ("a", "a"))
    val words = Seq(
      Seq("x", "a", "b"), Seq("a", "b", "c"), Seq("a", "a", "a"),
      Seq("a", "a", "a", "a"), Seq("q", "z"), Seq("a"), Seq.empty[String],
      Seq("x", "a", "b", "c", "a", "b"), Seq("ab", "x", "ab"))
      .zipWithIndex.map { case (s, i) => (i.toLong, 1L, s) }
      .toDF("word", "freq", "symbols")
    def out(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("word").select("symbols").as[Seq[String]].collect().toSeq
    val kernel = out(words.withColumn("symbols",
      graft.plans.BpeChunk.applyMerges(col("symbols"), merges)))
    val fold = {
      val r = out(Bpe.applyMergesFold(words, merges))
      Bpe.releaseCaches(); r
    }
    assert(kernel == fold, s"kernel $kernel vs fold $fold")
    assert(kernel(0) == Seq("x", "ab"), s"rank-order trap broken: ${kernel(0)}")
    assert(kernel(2) == Seq("aa", "a") && kernel(3) == Seq("aa", "aa"))
    // pre-existing "ab" tokens DO feed the rank-0 merge
    assert(kernel(8) == Seq("ab", "xab"), kernel(8).toString)
  }

  test("train reproduces the reference merge sequence exactly") {
    val got = Bpe.train(corpus, "text", numMerges = 12, minCount = 2L)
    val want = refBpe(corpusWords, numMerges = 12, minCount = 2L)
    assert(got == want)
    assert(got.nonEmpty)
    // the classic example learns word-final "est</w>" as a unit
    assert(got.exists { case (a, b, _) => a + b == "est</w>" })
  }

  test("incremental-delta train equals the full-recount trainer") {
    // richer corpus than the classic example: repeated chars exercise
    // greedy-overlap deltas ("aaa"), and many near-tied counts exercise
    // the (count desc, left, right) tie-break against maintained counts
    val messy = Seq(
      (0L, "aaa aaa aab abab banana bandana low lower lowest"),
      (1L, "banana bandana cabana low low lowest widest widest"),
      (2L, "ababab aab aaa cabana nana ban band bandana"))
      .toDF("doc_id", "text")
    val inc = Bpe.trainIncremental(messy, "text", numMerges = 25,
      minCount = 2L)
    val full = Bpe.trainFullRecount(messy, "text", numMerges = 25,
      minCount = 2L)
    assert(inc == full)
    assert(inc.size == 25 || inc.size == full.size)
    // the public size-gated entry agrees with both paths either side
    // of the gate
    assert(Bpe.train(messy, "text", 25, 2L,
      incrementalMinWords = 0L) == inc)
    assert(Bpe.train(messy, "text", 25, 2L,
      incrementalMinWords = Long.MaxValue) == full)
  }

  test("train stops when no pair reaches minCount") {
    val tiny = Seq((0L, "ab cd")).toDF("doc_id", "text")
    assert(Bpe.train(tiny, "text", 10, minCount = 2L).isEmpty)
    // with minCount=1 it keeps merging until every word is one symbol
    val all = Bpe.train(tiny, "text", 10, minCount = 1L)
    assert(all.size == 4) // ab + </w>, cd + </w> fully merged in 4 steps
  }

  test("vocabDf lays out base chars then merges, densely numbered") {
    val merges = Bpe.train(corpus, "text", 12, 2L).map(m => (m._1, m._2))
    val v = Bpe.vocabDf(corpus, "text", merges)
      .as[(String, Long)].collect()
    assert(v.map(_._2).sorted.toSeq == (0L until v.length).toSeq)
    val byTok = v.toMap
    // merged symbols numbered after every base symbol, in rank order
    val nBase = v.length - merges.length
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      assert(byTok(a + b) == nBase + i)
    }
    assert(byTok.contains("</w>"))
  }

  test("encodeDocs round-trips: ids decode back to the original text") {
    val merges = Bpe.train(corpus, "text", 12, 2L).map(m => (m._1, m._2))
    val idToTok = Bpe.vocabDf(corpus, "text", merges)
      .as[(String, Long)].collect().map(_.swap).toMap
    val enc = Bpe.encodeDocs(corpus, "doc_id", "text", merges)
      .as[(Long, Long, Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> r).toMap
    val original = corpus.as[(Long, String)].collect().toMap
    original.foreach { case (id, text) =>
      val (_, nTok, nSub, nOov, ids) = enc(id)
      assert(nTok == text.split(" ").length)
      assert(nSub == ids.length && nSub >= nTok)
      assert(nOov == 0L) // self-derived vocab: nothing can be OOV
      val decoded = ids.map(idToTok).mkString("")
        .replace("</w>", " ").trim
      assert(decoded == text, s"doc $id")
    }
  }

  test("encodeDocs counts OOV subwords per row instead of silent drops") {
    val merges = Bpe.train(corpus, "text", 12, 2L).map(m => (m._1, m._2))
    val vocab = Bpe.vocabDf(corpus, "text", merges)
    // "xyz" introduces characters the training corpus never saw — its
    // subwords are OOV under the shared vocab and must be COUNTED, not
    // silently dropped (the encode-loss detectability contract)
    val shard = Seq((7L, "low xyz")).toDF("doc_id", "text")
    val row = Bpe.encodeDocs(shard, "doc_id", "text", merges,
      vocab = Some(vocab))
      .as[(Long, Long, Long, Long, Seq[Long])].collect().head
    val (_, nTok, nSub, nOov, ids) = row
    assert(nTok == 2L)
    // "xyz" segments to [x, y, z, </w>]; the marker is a base vocab
    // symbol, so exactly x, y, z are OOV
    assert(nOov == 3L, s"x, y, z OOV, got $nOov")
    assert(nSub == ids.length)
    assert(nSub + nOov >= nTok)
  }

  test("a shared vocab keeps token ids stable across shards") {
    val merges = Bpe.train(corpus, "text", 12, 2L).map(m => (m._1, m._2))
    val vocab = Bpe.vocabDf(corpus, "text", merges)
    // the shards' character sets genuinely differ: doc 0 has
    // {l,o,w,e,r,n,s,t}, doc 1 has {n,e,w,s,t,i,d} — per-shard vocab
    // derivation would renumber ids
    val shardA = corpus.filter(col("doc_id") === 0L)
    val shardB = corpus.filter(col("doc_id") === 1L)
    def enc(df: org.apache.spark.sql.DataFrame) =
      Bpe.encodeDocs(df, "doc_id", "text", merges, vocab = Some(vocab))
        .as[(Long, Long, Long, Long, Seq[Long])].collect()
        .map(r => r._1 -> r._5).toMap
    val sharded = enc(shardA) ++ enc(shardB)
    val whole = enc(corpus)
    assert(sharded == whole) // same ids regardless of sharding
    // without the shared vocab, per-shard derivation would renumber:
    // the test corpus makes the shards' char sets genuinely differ
    val aChars = shardA.select(explode(split(col("text"), ""))).distinct().count()
    val bChars = shardB.select(explode(split(col("text"), ""))).distinct().count()
    assert(aChars != bChars)
  }

  test("fertility is 1.0 exactly when every word is a single subword") {
    val d = Seq((0L, "low low low")).toDF("doc_id", "text")
    // enough merges to fully fuse "low</w>"
    val merges = Bpe.train(d, "text", 10, 1L).map(m => (m._1, m._2))
    val f = Bpe.fertility(d, "doc_id", "text", merges)
      .as[(Long, Long, Long, Double)].collect().head
    assert(f == ((0L, 3L, 3L, 1.0)))
  }

  test("subwordCounts conserves total symbol mass under merging") {
    val merges = Bpe.train(corpus, "text", 12, 2L).map(m => (m._1, m._2))
    val sub = Bpe.subwordCounts(corpus, "text", merges)
      .as[(String, Long)].collect().toMap
    // segmentation covers each word occurrence exactly once: merged
    // symbols concatenate strings, so character mass (with the 4-char
    // end marker) is conserved under any merge sequence
    val wf = corpusWords
    val totalMass = wf.map { case (w, f) => (w.length + 4L) * f }.sum
    val gotMass = sub.map { case (s, n) => s.length.toLong * n }.sum
    assert(gotMass == totalMass)
    // frequent whole words surface as single subword units
    assert(sub.contains("newest</w>") || sub.contains("est</w>"))
  }
}
