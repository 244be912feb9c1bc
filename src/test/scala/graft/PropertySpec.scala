package graft

import graft.llm.Dedup
import graft.operators.Relational
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5: "scalacheck properties —
  * dedup idempotence, union-count, …"). Uses raw scalacheck generators
  * sampled with fixed seeds (the scalatest-scalacheck bridge isn't in
  * the offline dependency set); 10 deterministic samples per property.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int = 10): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
  private val docGen = Gen.chooseNum(3, 12)
    .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  test("dedupExact is idempotent and equals scala-side distinct") {
    samples(Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0, 5), wordGen)))
      .foreach { rows =>
        val df = rows.toDF("k", "w")
        val once = Relational.dedupExact(Seq("k", "w"))(df)
        val twice = Relational.dedupExact(Seq("k", "w"))(once.toDF())
        val n1 = once.count(); val n2 = twice.count()
        assert(n1 == n2)
        assert(n1 == rows.distinct.size)
      }
  }

  test("unionAll preserves total row count") {
    samples(Gen.zip(Gen.nonEmptyListOf(wordGen), Gen.nonEmptyListOf(wordGen)))
      .foreach { case (a, b) =>
        val df = Relational.unionAll(Seq(a.toDF("w"), b.toDF("w")))
        assert(df.count() == a.size + b.size)
      }
  }

  test("interpolateLinear output is bounded by bracketing values") {
    samples(Gen.listOfN(8, Gen.option(Gen.chooseNum(0.0, 100.0))))
      .filter(_.flatten.size >= 2)
      .foreach { vs =>
        val rows = vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
        val df = rows.toDF("sym", "x", "v")
        val out = Relational.interpolateLinear(Seq("sym"), "x", "v")(df)
          .select("v").collect()
          .flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
        val lo = vs.flatten.min - 1e-9
        val hi = vs.flatten.max + 1e-9
        assert(out.forall(v => v >= lo && v <= hi), s"$vs -> ${out.toSeq}")
      }
  }

  test("identical docs share minhash signatures; estimate stays in [0,1]") {
    samples(Gen.zip(docGen, docGen)).foreach { case (a, b) =>
      val df = Seq((0L, a), (1L, a), (2L, b)).toDF("doc_id", "text")
      val sig = Dedup.signatureFrame(df, "doc_id", "text", 2, 16)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(sig(0L) == sig(1L))
      val estAB = sig(0L).zip(sig(2L)).count { case (x, y) => x == y } / 16.0
      assert(estAB >= 0.0 && estAB <= 1.0)
      if (a == b) assert(estAB == 1.0)
    }
  }

  test("ngramJaccardPairs is ordered (id_a < id_b) and bounded in [0,1]") {
    samples(Gen.listOfN(4, docGen)).foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", 2).collect()
      pairs.foreach { r =>
        assert(r.getLong(0) < r.getLong(1))
        val j = r.getDouble(2)
        assert(j >= 0.0 && j <= 1.0)
      }
    }
  }
}
