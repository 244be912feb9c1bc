package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.{RepetitionStatsExpr, RepetitionStatsUtil}

/** The repetition_stats kernel against a naive driver-side reference
  * built straight from the documented definitions (sliding windows +
  * groupBy counts + interval-union coverage) — the kernel's single-pass
  * string-span form must agree everywhere, including the tie-break and
  * the overlap-no-double-count subtlety. */
class RepetitionStatsSpec extends SparkSpec {

  // --- naive reference: definitions verbatim ---
  private def ref(raw: String): Array[Double] = {
    val out = new Array[Double](RepetitionStatsUtil.WIDTH)
    val toks = raw.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).toSeq
    if (toks.isEmpty) return out
    def cp(s: String): Int = s.codePointCount(0, s.length)
    val total = toks.map(cp(_).toLong).sum
    out(RepetitionStatsUtil.WIDTH - 1) =
      toks.count(_.exists(Character.isLetter)).toDouble / toks.size
    var slot = 0
    for (n <- RepetitionStatsUtil.TOP_NS) {
      if (toks.size >= n && total > 0) {
        val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size)
        val (gram, c) = counts.toSeq.minBy { case (g, k) => (-k, g) }
        out(slot) = c.toDouble * (cp(gram) - (n - 1)) / total
      }
      slot += 1
    }
    for (n <- RepetitionStatsUtil.DUP_NS) {
      if (toks.size >= n && total > 0) {
        val grams = toks.sliding(n).map(_.mkString(" ")).toVector
        val counts = grams.groupBy(identity).view.mapValues(_.size)
        val covered = grams.indices
          .filter(i => counts(grams(i)) >= 2)
          .flatMap(i => i until i + n).toSet
        out(slot) = covered.toSeq.map(i => cp(toks(i)).toLong).sum
          .toDouble / total
      }
      slot += 1
    }
    out
  }

  private def samples[T](g: Gen[T], n: Int = 40): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  test("kernel equals the naive reference on repetition-rich random docs") {
    // tiny vocab forces n-gram collisions; mixed separators and casing
    // exercise the tokenizer; 𝒜 (supplementary) exercises code points
    val word = Gen.oneOf("aa", "b", "ccc", "AA", "𝒜x", "d1", "!!")
    val sep = Gen.oneOf(" ", "  ", "\t", " \n ")
    val doc = for {
      k <- Gen.chooseNum(0, 30)
      ws <- Gen.listOfN(k, word)
      ss <- Gen.listOfN(k, sep)
    } yield ws.zip(ss).map { case (w, s) => w + s }.mkString
    samples(doc).foreach { text =>
      val got = RepetitionStatsUtil.stats(text).toSeq
      val want = ref(text).toSeq
      assert(got == want, s"text=${text.replace("\n", "\\n")}")
    }
  }

  test("repeated phrase: coverage unions overlaps, never double-counts") {
    // "a b c d e" twice: every token sits in a duplicated 5-gram once
    // the sequence repeats, so dup5 coverage is exactly 1.0 even though
    // occurrences overlap at the seam
    val text = "a b c d e a b c d e"
    val s = RepetitionStatsUtil.stats(text)
    assert(s(3) == 1.0) // dup5
    assert(s(4) == 0.0) // dup6: the only repeated 6-grams would need 12 toks of period 5... none
    // top2: "a b" (and rotations) all occur twice; tie-break picks the
    // lexicographically smallest 2-gram among count-2 grams = "a b";
    // mass = 2 occurrences * 2 chars / 10 total chars
    assert(s(0) == 2.0 * 2 / 10)
    assert(s(9) == 1.0) // all alpha
  }

  test("tie-break is lexicographic among equal-count grams") {
    // "z y z y x w x w": "z y" x2 ties "x w" x2 (and "y z", "w x" x1?)
    // counts: "z y"=2, "y z"=1, "y x"=1, "x w"=2, "w x"=1 -> tie between
    // "x w" and "z y", lexicographically smallest is "x w"
    val s = RepetitionStatsUtil.stats("z y z y x w x w")
    assert(s(0) == 2.0 * 2 / 8)
    // and the chosen gram matters when masses differ: "bb a bb a cc cc"
    // has "bb a"=2 (mass 2*3=6) vs "cc cc"=1; top2 = 6/10
    val s2 = RepetitionStatsUtil.stats("bb a bb a cc cc")
    assert(s2(0) == 6.0 / 10)
  }

  test("degenerate inputs: empty, whitespace, shorter than n") {
    for (t <- Seq("", "   \t\n  ", "one", "a b c d")) {
      val s = RepetitionStatsUtil.stats(t)
      // no doc shorter than 5 tokens can have dup5..dup10 mass
      assert(RepetitionStatsUtil.DUP_NS.indices.forall(i => s(3 + i) == 0.0))
    }
    assert(RepetitionStatsUtil.stats("").forall(_ == 0.0))
    assert(RepetitionStatsUtil.stats("one")(0) == 0.0)      // T<2: top2=0
    assert(RepetitionStatsUtil.stats("12 34")(9) == 0.0)    // no letters
    assert(RepetitionStatsUtil.stats("a 12")(9) == 0.5)
  }

  test("codegen path == interpreted path over the corpus") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
    def run(): Array[Seq[Double]] = df
      .select(RepetitionStatsExpr.repetitionStats(col("text")).as("s"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Double](0))
    val gen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = run()
      assert(gen.length == interp.length && gen.length == 500)
      gen.zip(interp).foreach { case (a, b) => assert(a == b) }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
