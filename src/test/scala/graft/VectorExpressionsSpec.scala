package graft

import graft.plans.{GraftExtensions, VectorExpressions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("CosineSimilarity matches the HOF-based computation bit-for-bit-ish") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
      (Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f))) // zero norm -> null
      .toDF("a", "b")
    val out = df.select(
      VectorExpressions.cosineSim(col("a"), col("b")).as("native"),
      graft.functions.Vectors.cosine(col("a"), col("b")).as("hof"))
      .collect()
    out.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
    assert(out(2).isNullAt(0))
  }

  test("CosineSimilarity is null on length mismatch and null input") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f, 2.0f, 3.0f))),
      (None, Some(Seq(1.0f)))).toDF("a", "b")
    val out = df.select(VectorExpressions.cosineSim(col("a"), col("b")))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("CosineSimilarity propagates null elements as a null result") {
    val df = Seq(
      (Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))),
      (Seq(Some(1.0f), Some(2.0f)), Seq(Some(3.0f), Some(4.0f))))
      .toDF("a", "b")
    val cg = df.select(VectorExpressions.cosineSim(col("a"), col("b")))
      .collect()
    assert(cg(0).isNullAt(0))
    assert(!cg(1).isNullAt(0))
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(VectorExpressions.cosineSim(col("a"), col("b")))
        .collect()
      assert(interp(0).isNullAt(0))
      assert(!interp(1).isNullAt(0))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("HyperplaneBits == composed per-plane cosine sign form") {
    val planes = graft.llm.Similarity.planes(12, 8, 7L)
    val df = (1 to 60).map(i =>
      Seq.tabulate(8)(j => ((i * (j + 3)) % 11 - 5).toFloat)).toDF("v")
    def composed(v: org.apache.spark.sql.Column) =
      planes.zipWithIndex.map { case (pl, i) =>
        when(VectorExpressions.cosineSim(
          graft.functions.Vectors.asDouble(v),
          array(pl.map(lit(_)): _*)) >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    val out = df.select(
      VectorExpressions.hyperplaneBits(col("v"), planes).as("fused"),
      composed(col("v")).as("composed")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
    // zero-norm and wrong-length vectors hash to bucket 0
    val edge = Seq(Seq(0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f),
      Seq(1.0f, 2.0f)).toDF("v")
    val eo = edge.select(
      VectorExpressions.hyperplaneBits(col("v"), planes)).as[Long].collect()
    assert(eo.toSeq == Seq(0L, 0L))
  }

  test("HyperplaneBits codegen path == interpreted path") {
    val planes = graft.llm.Similarity.planes(9, 6, 3L)
    val df = (1 to 40).map(i =>
      Seq.tabulate(6)(j => ((i + j * j) % 9 - 4).toFloat)).toDF("v")
    val withCg = df.select(
      VectorExpressions.hyperplaneBits(col("v"), planes)).as[Long].collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(
        VectorExpressions.hyperplaneBits(col("v"), planes)).as[Long].collect()
      assert(withCg.toSeq == interp.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("CosineSimilarity codegen path == interpreted path") {
    val df = (1 to 50).map(i =>
      (Seq.tabulate(8)(j => (i * j % 7).toFloat),
        Seq.tabulate(8)(j => ((i + j) % 5).toFloat))).toDF("a", "b")
    val withCg = df.select(VectorExpressions.cosineSim(col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(VectorExpressions.cosineSim(col("a"), col("b")))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      assert(withCg.toSeq == interp.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("MinHashSig is bit-compatible with the array_min/transform/xxhash64 form") {
    val df = Seq(Seq("alpha beta", "gamma", "x"), Seq("one two three"))
      .toDF("sh")
    val k = 8
    val viaHof = df.select(array((0 until k).map(i =>
      array_min(transform(col("sh"), s => xxhash64(s, lit(i))))): _*).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val viaKernel = df.select(
      graft.plans.MinHashSig.minhashSig(col("sh"), k).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(viaHof.toSeq == viaKernel.toSeq)
  }

  test("MinHashSig is null on empty arrays, errors nowhere") {
    val df = Seq(Seq.empty[String]).toDF("sh")
    val out = df.select(graft.plans.MinHashSig.minhashSig(col("sh"), 4))
      .collect()
    assert(out.head.isNullAt(0))
  }

  test("hamming64 counts differing bits") {
    val df = Seq((0L, -1L), (5L, 4L), (7L, 7L)).toDF("a", "b")
    val out = df.select(VectorExpressions.hamming64(col("a"), col("b")))
      .as[Int].collect()
    assert(out.toSeq == Seq(64, 1, 0))
  }

  test("HammingZeroAsEquality turns simhash-equality joins into equi-joins") {
    GraftExtensions.registerInto(spark)
    val a = Seq((1L, 10L), (2L, 20L)).toDF("ida", "siga")
    val b = Seq((3L, 10L), (4L, 99L)).toDF("idb", "sigb")
    val joined = a.join(b,
      VectorExpressions.hamming64(col("siga"), col("sigb")) === 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(joined.select("ida", "idb").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 3L)))
  }

  test("graft SQL functions register and resolve via spark.sql") {
    GraftExtensions.registerInto(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
        "hamming64(5L, 4L) AS h").collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getInt(1) == 1)
    // the hashing kernels resolve too, and agree with the Column API
    val r2 = spark.sql(
      "SELECT minhash_sig(array('a b c', 'b c d'), 4) AS m, " +
        "simhash64(array(1L, 3L)) AS s, " +
        "winnow_fp('abcdefghij', 4, 3) AS w").collect().head
    assert(spark.sql("SELECT text_stats('the quick, fox!') AS t")
      .collect().head.getSeq[Long](0) == Seq(3L, 1L, 13L, 2L))
    assert(r2.getSeq[Long](r2.fieldIndex("m")).length == 4)
    val viaColumn = Seq("x").toDF("d").select(
      graft.plans.MinHashSig.minhashSig(
        array(lit("a b c"), lit("b c d")), 4).as("m"),
      graft.plans.Winnow.winnowFp(lit("abcdefghij"), 4, 3).as("w"))
      .collect().head
    assert(r2.getSeq[Long](r2.fieldIndex("m")) ==
      viaColumn.getSeq[Long](viaColumn.fieldIndex("m")))
    assert(r2.getSeq[Long](r2.fieldIndex("w")) ==
      viaColumn.getSeq[Long](viaColumn.fieldIndex("w")))
  }

  test("QuantizeInt8 produces the expected bytes; scale cancels in cosine") {
    // maxAbs = 1.0 -> q = round(127 * x): [64, -127, 32]
    val out = Seq(Seq(0.5f, -1.0f, 0.25f)).toDF("v")
      .select(VectorExpressions.quantizeInt8(col("v"))).collect().head
    assert(out.getAs[Array[Byte]](0).toSeq == Seq[Byte](64, -127, 32))
    // a uniformly scaled vector quantizes to the SAME bytes (the
    // reason no scale factor needs to ride along for cosine duty)
    val pair = Seq((Seq(0.5f, -1.0f, 0.25f), Seq(5.0f, -10.0f, 2.5f)))
      .toDF("a", "b")
      .select(VectorExpressions.quantizeInt8(col("a")).as("qa"),
        VectorExpressions.quantizeInt8(col("b")).as("qb")).collect().head
    assert(pair.getAs[Array[Byte]](0).toSeq ==
      pair.getAs[Array[Byte]](1).toSeq)
  }

  test("QuantizedCosine tracks the float cosine within quantization error") {
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(50)((Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("a", "b")
    val out = df.select(
      VectorExpressions.cosineSim(col("a"), col("b")).as("f"),
      VectorExpressions.quantizedCosine(
        VectorExpressions.quantizeInt8(col("a")),
        VectorExpressions.quantizeInt8(col("b"))).as("q"))
      .as[(Double, Double)].collect()
    out.foreach { case (f, q) =>
      assert(math.abs(f - q) < 0.03, s"float $f vs int8 $q drifted") }
  }

  test("QuantizedCosine null rules: zero/null-element vectors, length mismatch") {
    val zero = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
      .select(VectorExpressions.quantizedCosine(
        VectorExpressions.quantizeInt8(col("a")),
        VectorExpressions.quantizeInt8(col("b")))).collect().head
    assert(zero.isNullAt(0), "zero-norm side must be null")
    val nullElem = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))))
      .toDF("a", "b")
      .select(VectorExpressions.quantizedCosine(
        VectorExpressions.quantizeInt8(col("a")),
        VectorExpressions.quantizeInt8(col("b")))).collect().head
    assert(nullElem.isNullAt(0), "null-element vector must be null")
    val mismatch = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
      .select(VectorExpressions.quantizedCosine(
        VectorExpressions.quantizeInt8(col("a")),
        VectorExpressions.quantizeInt8(col("b")))).collect().head
    assert(mismatch.isNullAt(0), "length mismatch must be null")
  }

  test("PqEncode/PqLut/PqAdc: known codebook, ADC == LUT-sum by hand") {
    // m=2 subspaces of 2 dims, 2 centroids each; centroid norms chosen
    // like real trained pieces of unit vectors (reconstructions are
    // unit-norm), so ADC genuinely approximates cosine
    val cb: Array[Array[Array[Float]]] = Array(
      Array(Array(0.7071f, 0.0f), Array(0.0f, 0.7071f)),
      Array(Array(0.5f, 0.5f), Array(-0.5f, 0.5f)))
    // normalized: [1,0, .7071,.7071] scaled by 2 -> same code
    val df = Seq(
      Seq(2.0f, 0.0f, 1.4142f, 1.4142f),
      Seq(0.0f, 1.0f, -0.5f, 0.5f)).toDF("v")
    val codes = df.select(VectorExpressions.pqEncode(col("v"), cb))
      .collect().map(_.getAs[Array[Byte]](0).toSeq)
    // vectors normalize to [.707,0,.5,.5] and [0,.816,-.408,.408]:
    // nearest sub-centroids are (0,0) and (1,1)
    assert(codes(0) == Seq[Byte](0, 0), s"got ${codes(0)}")
    assert(codes(1) == Seq[Byte](1, 1), s"got ${codes(1)}")
    // ADC against a query equals the hand-summed LUT entries
    val q = Seq((Seq(1.0f, 0.0f, 1.0f, 0.0f), Seq(2.0f, 0.0f, 1.4142f, 1.4142f)))
      .toDF("qv", "cv")
    val row = q.select(
      VectorExpressions.pqLut(col("qv"), cb).as("lut"),
      VectorExpressions.pqAdc(VectorExpressions.pqLut(col("qv"), cb),
        VectorExpressions.pqEncode(col("cv"), cb), 2).as("adc"))
      .collect().head
    val lut = row.getSeq[Float](0)
    assert(lut.length == 4)
    // cv codes to (0, 0) -> adc = lut[0*2+0] + lut[1*2+0]
    assert(math.abs(row.getDouble(1) - (lut(0) + lut(2))) < 1e-6)
    // and the ADC approximates the true cosine of the normalized pair
    val trueCos = q.select(VectorExpressions.cosineSim(col("qv"), col("cv")))
      .collect().head.getDouble(0)
    assert(math.abs(row.getDouble(1) - trueCos) < 0.15,
      s"adc ${row.getDouble(1)} vs cosine $trueCos")
  }

  test("PQ null rules: zero/null-element/length-mismatch vectors -> null") {
    val cb: Array[Array[Array[Float]]] = Array(
      Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
    val out = Seq(
      (1L, Seq(Option(0.0f), Option(0.0f))),       // zero norm
      (2L, Seq(Option(1.0f), None)),               // null element
      (3L, Seq(Option(1.0f), Option(0.0f), Option(1.0f)))) // wrong length
      .toDF("id", "v")
      .select(col("id"), VectorExpressions.pqEncode(col("v"), cb).as("c"))
      .collect()
    out.foreach(r => assert(r.isNullAt(1), s"id ${r.getLong(0)} not null"))
    // PqAdc: stride mismatch -> null
    val bad = Seq((Seq(1.0f, 2.0f, 3.0f), Array[Byte](0, 0))).toDF("lut", "c")
      .select(VectorExpressions.pqAdc(col("lut"), col("c"), 2)).collect().head
    assert(bad.isNullAt(0))
  }

  test("PqEncode/PqAdc codegen path == interpreted path") {
    val rnd = new scala.util.Random(3)
    val cb: Array[Array[Array[Float]]] = Array.fill(4)(
      Array.fill(8)(Array.fill(2)(rnd.nextFloat() * 2 - 1)))
    val df = (1 to 40).map(i =>
      Seq.tabulate(8)(j => ((i * 7 + j * 3) % 11 - 5).toFloat)).toDF("v")
    def run() = df.select(
      VectorExpressions.pqAdc(VectorExpressions.pqLut(col("v"), cb),
        VectorExpressions.pqEncode(col("v"), cb), 8))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val withCg = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(withCg.toSeq == run().toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("L2SqConst: HOF parity incl. empty centroid, nulls, codegen") {
    import graft.functions.Vectors
    val cent = Array(1.0, 2.0, 3.0)
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0)),   // exact -> 0.0
      (2L, Seq(2.0, 4.0, 6.0)),   // 1+4+9 = 14
      (3L, Seq(1.0, 2.0)),        // length mismatch -> null
      (4L, Seq.empty[Double]))    // empty -> null vs 3-dim cent
      .toDF("id", "v")
    def got(c: Array[Double]) = df
      .select(col("id"), VectorExpressions.l2sqConst(col("v"), c))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(cent) == Map(1L -> Some(0.0), 2L -> Some(14.0),
      3L -> None, 4L -> None))
    // kernel == the aggregate(zip_with) HOF it replaced, same rows
    val hof = df.select(col("id"),
      Vectors.l2sq(col("v"), array(cent.map(lit).toSeq: _*)))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(cent) == hof)
    // EMPTY centroid must not throw at construction (an empty seed
    // vector is legal): d=0.0 against empty input, null otherwise
    assert(got(Array.empty[Double]) == Map(1L -> None, 2L -> None,
      3L -> None, 4L -> Some(0.0)))
  }

  test("QuantizeInt8/QuantizedCosine codegen path == interpreted path") {
    val df = (1 to 50).map(i =>
      (Seq.tabulate(8)(j => (i * j % 7 - 3).toFloat),
        Seq.tabulate(8)(j => ((i + j) % 5 - 2).toFloat))).toDF("a", "b")
    def run() = df.select(VectorExpressions.quantizedCosine(
        VectorExpressions.quantizeInt8(col("a")),
        VectorExpressions.quantizeInt8(col("b"))))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val withCg = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(withCg.toSeq == run().toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
