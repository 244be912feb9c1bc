package graft.tools

import graft.Tables
import graft.llm.{Dedup, Lines}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway scale probes for the line-level cleaning and repeated-span
  * operators (not library surface). Regenerates the 10x key-shifted
  * replica of sf0.1 documents if missing (same construction as the
  * SCALING.md method note: id-shifted copies, text payloads repeat —
  * which deliberately stresses the dedup paths: EVERY window/line in a
  * replicated doc is duplicated 10x). */
object LineSpanScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val tenxPath = "/tmp/scale10x/documents.parquet"
    if (!new java.io.File(tenxPath).exists()) {
      val d = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      (0 until 10).map(i =>
          d.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(tenxPath)
      println("wrote 10x documents")
    }
    val d1 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val d10 = Tables.load(spark, "/tmp/scale10x", "documents")

    def time(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.count()
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
      Dedup.releaseCaches()
      Lines.releaseCaches()
      graft.llm.Bpe.releaseCaches()
    }

    // multi-line re-wrap (the graded corpus shape) at both scales
    def wrap(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        split(graft.functions.Text.normWs(col("text")), " ").as("__t"))
      .select(col("doc_id"),
        array_join(transform(sequence(lit(1), size(col("__t")), lit(12)),
          st => concat_ws(" ", slice(col("__t"), st, lit(12)))), "\n")
          .as("text"))

    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      time("lineDocFreq            5k docs")(
        Lines.lineDocFreq(wrap(d1), "doc_id", "text"))
      time("lineDocFreq           50k docs")(
        Lines.lineDocFreq(wrap(d10), "doc_id", "text"))
      time("stripBoilerplate       5k docs")(
        Lines.stripBoilerplate(wrap(d1), "doc_id", "text", 2))
      time("stripBoilerplate      50k docs")(
        Lines.stripBoilerplate(wrap(d10), "doc_id", "text", 2))
      time("stripBoilerplateScreen 50k docs")(
        Lines.stripBoilerplateScreen(wrap(d10), "doc_id", "text", 2))
      time("repeatedSpans          5k docs")(
        Dedup.repeatedSpans(d1, "doc_id", "text", 15))
      time("repeatedSpans         50k docs")(
        Dedup.repeatedSpans(d10, "doc_id", "text", 15))
      time("removeRepeatedSpans    5k docs")(
        Dedup.removeRepeatedSpans(d1, "doc_id", "text", 15))
      time("removeRepeatedSpans   50k docs")(
        Dedup.removeRepeatedSpans(d10, "doc_id", "text", 15))
      time("dsirWeights            5k docs")(
        graft.llm.Dsir.importanceWeights(d1,
          d1.filter(col("lang") === "en"), "doc_id", "text"))
      time("dsirWeights           50k docs")(
        graft.llm.Dsir.importanceWeights(d10,
          d10.filter(col("lang") === "en"), "doc_id", "text"))
      val t0 = System.nanoTime()
      val m1 = graft.llm.Bpe.train(d1, "text", 12)
      println(f"bpe.train(12)          5k docs        ${(System.nanoTime() - t0) / 1e9}%8.3f s   merges=${m1.size}")
      val t1 = System.nanoTime()
      val m10 = graft.llm.Bpe.train(d10, "text", 12)
      println(f"bpe.train(12)         50k docs        ${(System.nanoTime() - t1) / 1e9}%8.3f s   merges=${m10.size}")
      println("merge sequences equal: " + (m1.map(m => (m._1, m._2)) == m10.map(m => (m._1, m._2))))
      val mergesShared = m1.map(m => (m._1, m._2))
      val vocabShared = graft.llm.Bpe.vocabDf(d1, "text", mergesShared)
      time("bpe.fertility          5k docs")(
        graft.llm.Bpe.fertility(d1, "doc_id", "text", mergesShared))
      time("bpe.fertility         50k docs")(
        graft.llm.Bpe.fertility(d10, "doc_id", "text", mergesShared))
      time("bpe.encodeDocs         5k docs")(
        graft.llm.Bpe.encodeDocs(d1, "doc_id", "text", mergesShared,
          vocab = Some(vocabShared)))
      time("bpe.encodeDocs        50k docs")(
        graft.llm.Bpe.encodeDocs(d10, "doc_id", "text", mergesShared,
          vocab = Some(vocabShared)))
    }
    spark.stop()
  }
}
