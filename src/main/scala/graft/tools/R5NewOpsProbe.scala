package graft.tools

import graft.Tables
import graft.llm.{LanguageModel, Lines}
import graft.operators.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway 10x scale probes for the round-5 additions (not library
  * surface): keep-first paragraph dedup, connected components, and
  * per-language perplexity buckets. Reuses the SCALING.md 10x
  * id-shifted replica (text payloads repeat — every paragraph is
  * duplicated 10x, the dedup stress case). Connected components is
  * probed on synthetic graphs instead: its cost is (edges, labels,
  * rounds)-shaped and text-free, so graph topology is the axis that
  * matters — band-shaped dup groups (shallow) vs a long chain (the
  * diameter worst case the docstring warns about). */
object R5NewOpsProbe {
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
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
      LanguageModel.releaseCaches()
      Lines.releaseCaches()
    }

    def wrap(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        split(graft.functions.Text.normWs(col("text")), " ").as("__t"))
      .select(col("doc_id"),
        array_join(transform(sequence(lit(1), size(col("__t")), lit(12)),
          st => concat_ws(" ", slice(col("__t"), st, lit(12)))), "\n")
          .as("text"))

    // synthetic graphs: `groups` dup-groups of size 5 (clique-ish: a
    // star within each group — 1 round to close), plus one 50-node
    // chain (10 rounds at propagation speed ~diameter/2 per direction)
    def groupGraph(groups: Long): (DataFrame, DataFrame) = {
      val nodes = spark.range(groups * 5).toDF("id")
      val edges = spark.range(groups * 5).toDF("id")
        .filter(col("id") % 5 =!= 0)
        .select((col("id") - col("id") % 5).as("id_a"), col("id").as("id_b"))
      (nodes, edges)
    }

    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      time("dedupParagraphs       5k docs")(
        Lines.dedupParagraphs(wrap(d1), "doc_id", "text", sep = "\n"))
      time("dedupParagraphs      50k docs")(
        Lines.dedupParagraphs(wrap(d10), "doc_id", "text", sep = "\n"))
      time("pplBuckets            5k docs")(
        LanguageModel.pplBuckets(d1, "doc_id", "text", "lang"))
      time("pplBuckets           50k docs")(
        LanguageModel.pplBuckets(d10, "doc_id", "text", "lang"))
      val (n1, e1) = groupGraph(100000L)
      time("connectedComponents  500k nodes star-groups")(
        Graph.connectedComponents(n1, e1))
      val (n10, e10) = groupGraph(1000000L)
      time("connectedComponents    5M nodes star-groups")(
        Graph.connectedComponents(n10, e10))
      val chainNodes = spark.range(50).toDF("id")
      val chainEdges = spark.range(49)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      time("connectedComponents   50-node chain (worst)")(
        Graph.connectedComponents(chainNodes, chainEdges, maxIter = 60))
      // best-fit packing: shard-array aggregate — cost scales with
      // docs-per-shard, so hold shard size fixed and scale shard count
      def packed(df: DataFrame, shards: Int): DataFrame = {
        val docs = graft.operators.Relational.withHashSplit(
          df.select(col("doc_id"),
            graft.functions.Text.tokenCount(col("text")).as("n_tokens")),
          col("doc_id"), shards, "shard")
        graft.llm.Packing.bestFitPacks(docs, "doc_id", "n_tokens",
          2048L, "shard")
      }
      time("bestFitPacks          5k docs, 10 shards")(packed(d1, 10))
      time("bestFitPacks         50k docs, 100 shards")(packed(d10, 100))
    }
    spark.stop()
  }
}
