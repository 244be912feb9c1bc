package graft

import graft.llm.Unigram
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq.tabulate(40)(i =>
    (i.toLong, if (i % 4 == 3) "quux corge" else "hello world hello"))
    .toDF("doc_id", "text")

  test("viterbi segmentation concatenates back to the word, ties prefer longer") {
    val logp = Map("h" -> -5.0, "e" -> -5.0, "l" -> -5.0, "o" -> -5.0,
      "he" -> -3.0, "llo" -> -3.0, "hello" -> -2.0)
    val seg = Unigram.viterbi("hello", logp, maxPieceLen = 6)
    assert(seg.toSeq == Seq("hello"), s"expected whole word, got ${seg.toSeq}")
    assert(seg.mkString == "hello")
    // remove the whole-word piece: best is he + llo
    val seg2 = Unigram.viterbi("hello", logp - "hello", maxPieceLen = 6)
    assert(seg2.toSeq == Seq("he", "llo"))
    assert(seg2.mkString == "hello")
    // unseen character falls back to per-char, never crashes
    assert(Unigram.viterbi("héllo", logp, 6).mkString == "héllo")
  }

  test("hard-EM objective is monotone non-decreasing across iterations") {
    val (vocab, objective) = Unigram.trainWithObjective(
      corpus, "text", vocabSize = 50, iters = 4, maxPieceLen = 6,
      seedSize = 200)
    Unigram.releaseCaches()
    assert(objective.size == 4)
    objective.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-6, s"objective regressed: $objective")
    }
    // frequent whole words must survive as single pieces
    val pieces = vocab.select("piece").as[String].collect().toSet
    assert(pieces.contains("hello") && pieces.contains("world"),
      s"frequent words not learned: $pieces")
  }

  test("encodeDocs: fertility 1.0 once whole words are in the vocabulary") {
    val vocab = Unigram.train(corpus, "text", vocabSize = 50, iters = 3,
      maxPieceLen = 6, seedSize = 200)
    Unigram.releaseCaches()
    val enc = Unigram.encodeDocs(corpus, "doc_id", "text", vocab)
      .orderBy("doc_id").collect()
    assert(enc.length == 40)
    val r0 = enc(0) // "hello world hello"
    assert(r0.getLong(1) == 3L && r0.getLong(2) == 3L &&
      r0.getDouble(3) == 1.0, s"unexpected: $r0")
    // rare words segment into more pieces than words
    val r3 = enc(3) // "quux corge"
    assert(r3.getLong(1) == 2L && r3.getLong(2) >= 2L)
  }

  test("codegen encode kernel == typed-map encode, row for row") {
    // real-ish vocab over the training corpus plus adversarial docs:
    // empty text, whitespace-only, unseen characters (per-char
    // fallback), repeated words
    val docs = corpus.unionByName(Seq(
      (100L, ""), (101L, "   "), (102L, "héllo wörld"),
      (103L, "hello hello hello hello")).toDF("doc_id", "text"))
    val vocab = Unigram.train(corpus, "text", vocabSize = 50, iters = 2,
      maxPieceLen = 6, seedSize = 200)
    Unigram.releaseCaches()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val kernel = rows(Unigram.encodeDocs(docs, "doc_id", "text", vocab))
    val typed = rows(Unigram.encodeDocsTyped(docs, "doc_id", "text", vocab))
    assert(kernel == typed, s"kernel/typed divergence")
    assert(kernel.size == 44)
    // interpreted == codegen for the kernel expression itself
    val logp = vocab.select("piece", "logp").as[(String, Double)]
      .collect().toMap
    val e = graft.plans.UnigramEncodeStats(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("hello", "quux", "héllo"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      logp, 6)
    val interp = e.eval(null)
    assert(interp != null && interp.asInstanceOf[
      org.apache.spark.sql.catalyst.InternalRow].getLong(0) == 3L)
  }

  test("q_unigram_train_gate emits a passing monotonicity row") {
    val r = SparkEntry.queries("q_unigram_train_gate")(
      spark, "/root/testdata/sf0.001").collect()
    Unigram.releaseCaches()
    assert(r.length == 1, "gate must pass (0 rows = objective regressed)")
    assert(r.head.getAs[Boolean]("monotone") && r.head.getAs[Boolean]("pass"))
    assert(r.head.getAs[Long]("n_iters") == 3L)
  }
}
