package graft

import graft.llm.WordPiece
import graft.plans.WordPieceUtil
import org.apache.spark.sql.functions._

/** WordPiece greedy encoder: BERT-style longest-match-first semantics,
  * kernel==reference equality, vocab seeding, and the graded gates. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val bert = WordPiece.Vocab(
    init = Set("un", "a", "u", "n", "f", "b", "l", "e"),
    cont = Set("aff", "able", "a", "f", "b", "l", "e"),
    maxPieceLen = 8)

  test("greedy longest-match: the BERT 'unaffable' example") {
    // un ##aff ##able -> 3 pieces
    assert(WordPieceUtil.pieces("unaffable", bert.init, bert.cont, 8) == 3)
  }

  test("greedy commits to the longest prefix even when suboptimal") {
    // vocab: init {ab, a}, cont {c, bc}. Word "abc":
    // greedy takes "ab" then "##c" (2 pieces); Viterbi could also do
    // a + bc (2) — now remove cont "c": greedy "ab" then STUCK -> UNK,
    // while a + ##bc would have worked. That asymmetry IS the rule.
    val v1 = WordPiece.Vocab(Set("ab", "a"), Set("c", "bc"), 8)
    assert(WordPieceUtil.pieces("abc", v1.init, v1.cont, 8) == 2)
    val v2 = WordPiece.Vocab(Set("ab", "a"), Set("bc"), 8)
    assert(WordPieceUtil.pieces("abc", v2.init, v2.cont, 8) == -1)
  }

  test("unknown word -> -1; single chars cover when present") {
    val v = WordPiece.Vocab(Set("x"), Set("y"), 8)
    assert(WordPieceUtil.pieces("xyy", v.init, v.cont, 8) == 3)
    assert(WordPieceUtil.pieces("xz", v.init, v.cont, 8) == -1)
    assert(WordPieceUtil.pieces("zx", v.init, v.cont, 8) == -1)
  }

  test("encodeStats kernel == per-word reference on a real corpus") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "unaffable cats concatenate"),
      (3L, ""),
      (4L, "zz zz zz")).toDF("doc_id", "text")
    val v = WordPiece.seedVocab(docs, "text", 50)
    val got = WordPiece.encodeStats(docs, "doc_id", "text", v)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    docs.collect().foreach { r =>
      val id = r.getLong(0)
      val words = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
      var (nw, np, nu) = (0L, 0L, 0L)
      words.foreach { w =>
        nw += 1
        val p = WordPiece.greedyPieces(w, v)
        if (p < 0) { nu += 1; np += 1 } else np += p
      }
      assert(got(id) == ((nw, np, nu)), s"doc $id")
    }
  }

  test("code-point semantics: supplementary-plane chars never split") {
    // U+1F600 is a surrogate pair in UTF-16; the kernel must slice on
    // code points (the seedVocab unit) — a UTF-16 walk would try a
    // lone-surrogate piece the vocab can't contain
    val smile = new String(Character.toChars(0x1F600))
    val docs = Seq((1L, s"ab${smile}cd ab xy${smile}"))
      .toDF("doc_id", "text")
    val v = WordPiece.seedVocab(docs, "text", 100)
    assert(v.init.exists(p => p.codePointCount(0, p.length) == 1 &&
      p.codePointAt(0) == 0x1F600) ||
      v.cont.exists(p => p.codePointCount(0, p.length) == 1 &&
        p.codePointAt(0) == 0x1F600))
    val r = WordPiece.encodeStats(docs, "doc_id", "text", v)
      .collect().head
    assert(r.getAs[Long]("n_unk") == 0L)
    // chars-only vocab (code-point singletons) also covers it
    def oneCp(s: String) = s.codePointCount(0, s.length) == 1
    val chars = WordPiece.Vocab(v.init.filter(oneCp),
      v.cont.filter(oneCp), v.maxPieceLen)
    val rc = WordPiece.encodeStats(docs, "doc_id", "text", chars)
      .collect().head
    assert(rc.getAs[Long]("n_unk") == 0L)
    // "ab<smile>cd" = 5 code points -> 5 pieces under chars-only
    assert(WordPiece.greedyPieces(s"ab${smile}cd", chars) == 5)
  }

  test("seedVocab: single chars always retained -> zero UNK on corpus") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val v = WordPiece.seedVocab(docs, "text", 3) // tiny budget
    val r = WordPiece.encodeStats(docs, "doc_id", "text", v)
      .collect().head
    assert(r.getAs[Long]("n_unk") == 0L)
    assert(r.getAs[Long]("n_words") == 6L)
  }

  test("bigger vocab never lengthens the encoding (the gate invariant)") {
    val docs = (1 to 30).map(i =>
      (i.toLong, s"token$i repeated token$i structure common words"))
      .toDF("doc_id", "text")
    val big = WordPiece.seedVocab(docs, "text", 2000)
    def oneCp(s: String) = s.codePointCount(0, s.length) == 1
    val chars = WordPiece.Vocab(big.init.filter(oneCp),
      big.cont.filter(oneCp), big.maxPieceLen)
    def total(v: WordPiece.Vocab) =
      WordPiece.encodeStats(docs, "doc_id", "text", v)
        .agg(sum(col("n_pieces"))).collect().head.getLong(0)
    assert(total(big) <= total(chars))
  }
}
