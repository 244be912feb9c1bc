package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.plans.TextStatsExpr

/** The native text_stats kernel must count EXACTLY what the original
  * regex/HOF column pipeline counted — these reference implementations
  * are the pre-kernel forms of the Text metrics, kept here as the
  * ground truth. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  // --- reference (pre-kernel) column forms ---
  private def refTokenCount(text: Column): Column =
    when(length(Text.normWs(text)) === 0, lit(0))
      .otherwise(size(Text.tokens(text)))

  private def refStopwordRatio(text: Column): Column = {
    val toks = Text.tokens(lower(text))
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(Text.stopwords.map(lit(_)): _*)))
        .cast("double") / size(toks).cast("double"))
  }

  private def refPunctRatio(text: Column): Column = {
    val body = regexp_replace(text, "\\s+", "")
    when(length(body) === 0, lit(0.0)).otherwise(
      length(regexp_replace(body, "[\\p{L}\\p{N}]", "")).cast("double") /
        length(body).cast("double"))
  }

  private def refMeanTokenLen(text: Column): Column = {
    val n = refTokenCount(text)
    when(n === 0, lit(0.0)).otherwise(
      length(regexp_replace(Text.normWs(text), " ", "")).cast("double") /
        n.cast("double"))
  }

  private val edgeCases = Seq(
    "", " ", "   \t\n\f\r  ", "one", "the", "THE And oF a",
    "thee ana it, is.", "a-b c_d 1.5 e!f", "¡hola! ¿qué?",
    "1234 ¾ Ⅷ ٣ ६",                       // Nd, No, Nl, arabic, devanagari
    "𝔸𝔹 mathletters", "emoji 😀 and ☂ sym", // supplementary, So
    "combining á mark", "İstanbul İS K KELVIN",
    "ſtop the preſs", "tab\tsep\nlines\rcr", "trailing space ",
    " leading", "double  space", "punct-only !!! ??? ...",
    "mixed THE quick a fox with 42 by 0x1F")

  private def corpusPlus = {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
    docs.unionByName(edgeCases.toDF("text"))
      .unionByName(Seq(Option.empty[String]).toDF("text"))
  }

  test("kernel metrics equal the regex/HOF reference forms everywhere") {
    val rows = corpusPlus.select(
      Text.tokenCount(col("text")).as("k_tok"),
      refTokenCount(col("text")).as("r_tok"),
      Text.stopwordRatio(col("text")).as("k_stop"),
      refStopwordRatio(col("text")).as("r_stop"),
      Text.punctRatio(col("text")).as("k_punct"),
      refPunctRatio(col("text")).as("r_punct"),
      Text.meanTokenLen(col("text")).as("k_len"),
      refMeanTokenLen(col("text")).as("r_len"),
      col("text")).collect()
    rows.foreach { r =>
      def eqAt(a: Int, b: Int): Boolean =
        (r.isNullAt(a) && r.isNullAt(b)) ||
          (!r.isNullAt(a) && !r.isNullAt(b) && r.get(a) == r.get(b))
      assert(eqAt(0, 1) && eqAt(2, 3) && eqAt(4, 5) && eqAt(6, 7),
        s"mismatch for text=${r.get(8)}: $r")
    }
    assert(rows.length == 500 + edgeCases.length + 1)
  }

  test("text_stats codegen path == interpreted path") {
    val df = corpusPlus
    def run(): Array[Seq[Long]] = df
      .select(TextStatsExpr.textStats(col("text")).as("s")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0))
    val gen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = run()
      assert(gen.length == interp.length)
      gen.zip(interp).foreach { case (a, b) => assert(a == b) }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("nfc_normalize: composed==decomposed, idempotent, ascii identity") {
    import graft.plans.UnicodeNormExpr.nfcNormalize
    val composed = "café résumé"              // é as U+00E9
    val decomposed = "cafe\u0301 re\u0301sume\u0301"         // e + U+0301
    val df = Seq(composed, decomposed, "plain ascii", "",
      "𝔸 math", "mixed café and café").toDF("t")
    val out = df.select(col("t"), nfcNormalize(col("t")).as("n"))
      .as[(String, String)].collect().toMap
    // the two é spellings canonicalize to the same bytes
    assert(out(composed) == out(decomposed))
    assert(out(composed) == composed)            // NFC keeps composed
    assert(out("plain ascii") == "plain ascii")  // ascii fast path
    assert(out("") == "")
    // idempotent
    val twice = df.select(nfcNormalize(nfcNormalize(col("t"))).as("n2"))
      .as[String].collect()
    assert(twice.toSet == out.values.toSet)
    // the dedup consequence: fingerprints of the two spellings agree
    // only AFTER normalization
    val fp = Seq((1L, composed), (2L, decomposed)).toDF("id", "t")
    val raw = fp.select(Text.fingerprint(col("t")).cast("string").as("f"))
      .as[String].collect()
    assert(raw(0) != raw(1))
    val norm = fp.select(
        Text.fingerprint(nfcNormalize(col("t"))).cast("string").as("f"))
      .as[String].collect()
    assert(norm(0) == norm(1))
    // codegen == interpreted
    def run(): Array[String] =
      df.select(nfcNormalize(col("t"))).as[String].collect()
    val gen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run().toSeq == gen.toSeq)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // SQL registration
    graft.plans.GraftExtensions.registerInto(spark)
    df.createOrReplaceTempView("nfc_in")
    assert(spark.sql(s"SELECT nfc_normalize(t) FROM nfc_in")
      .as[String].collect().toSet == out.values.toSet)
  }

  test("qualityScore on the kernel matches the assembled reference formula") {
    val refQuality = {
      val lenScore =
        least(refTokenCount(col("text")).cast("double") / lit(100.0), lit(1.0))
      val stopScore = least(refStopwordRatio(col("text")) * lit(4.0), lit(1.0))
      val punctPenalty = least(refPunctRatio(col("text")) * lit(2.0), lit(1.0))
      round(lit(0.5) * lenScore + lit(0.5) * stopScore
        - lit(0.25) * punctPenalty, 6)
    }
    val rows = corpusPlus.select(
      Text.qualityScore(col("text")).as("k"), refQuality.as("r")).collect()
    rows.foreach { r =>
      assert((r.isNullAt(0) && r.isNullAt(1)) ||
        r.getDouble(0) == r.getDouble(1), r.toString)
    }
  }
}
