package graft.tools

import graft.Tables
import graft.llm.{Dedup, LanguageModel, Unigram}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway 10x scale probes for the round-6 additions (not library
  * surface): Kneser-Ney bigram scoring, soft dedup reweighting,
  * unigram-LM tokenizer training, and the frequent-items sketch.
  * Same 10x id-shifted replica as R5NewOpsProbe — texts repeat 10x,
  * so the bigram TYPE table and distinct-word table stay constant
  * while corpus rows grow 10x: the probes separate corpus-scaled
  * from vocabulary-scaled cost, which is exactly the claim the
  * scaladocs make. */
object R6NewOpsProbe {
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
      // median of 3 (first run pays codegen JIT)
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f.count()
        LanguageModel.releaseCaches()
        Unigram.releaseCaches()
        Dedup.releaseCaches()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"$label%-36s $med%8.3f s   rows=${runs.head._2}")
    }

    for ((tag, d) <- Seq("1x" -> d1, "10x" -> d10)) {
      time(s"kneserNeyBigramScore $tag") {
        LanguageModel.kneserNeyBigramScore(d, "doc_id", "text")
      }
      time(s"softDedupWeights $tag") {
        Dedup.softDedupWeights(d, "doc_id", "text")
      }
      time(s"unigram train+encode $tag") {
        Unigram.encodeDocs(d, "doc_id", "text",
          Unigram.train(d, "text", vocabSize = 1500, iters = 3,
            maxPieceLen = 6, seedSize = 8000))
      }
      time(s"frequentItems tokens $tag") {
        graft.operators.Aggregates.frequentItems(
          d.select(explode(graft.functions.Text.tokens(
            lower(col("text")))).as("item"))
            .filter(length(col("item")) > 0), "item", 0.02)
      }
    }
    spark.stop()
  }
}
