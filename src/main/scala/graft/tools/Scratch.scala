package graft.tools

import graft.Tables
import graft.functions.Text
import graft.llm.Dedup
import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage profiler (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.count()
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$n")
    }

    val shingleN = 3

    // v1: one-shuffle bucket build (collect_set), codegen'd double-explode
    // pair generation, count_distinct per-doc sizes
    def v1(df: DataFrame, minJaccard: Double): DataFrame = {
      val toks = df.select(col("doc_id").as("id"),
        split(lower(Text.normWs(col("text"))), " ").as("t"))
      val starts = when(size(col("t")) >= shingleN,
        sequence(lit(1), size(col("t")) - (shingleN - 1))).otherwise(array())
      val shRaw = toks
        .select(col("id"), col("t"), explode(starts).as("i"))
        .select(col("id"),
          xxhash64(concat_ws(" ", slice(col("t"), col("i"), lit(shingleN))))
            .as("shingle"))
      val counts = shRaw.groupBy("id")
        .agg(count_distinct(col("shingle")).as("n_sh"))
      val buckets = shRaw.groupBy("shingle")
        .agg(sort_array(collect_set(col("id"))).as("ids"))
        .filter(size(col("ids")) > 1)
      val pairs = buckets
        .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
        .select(col("id_a"),
          explode(slice(col("ids"), col("i") + lit(2), size(col("ids"))))
            .as("id_b"))
      val inter = pairs.groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(counts.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
        .join(counts.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
        .withColumn("jaccard", round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"), 6))
        .filter(col("jaccard") >= minJaccard)
        .select("id_a", "id_b", "jaccard")
    }

    def docs = Tables.load(spark, sfDir, "documents")
    for (pass <- 1 to 3) {
      println(s"--- pass $pass (fresh lineage each call)")
      time("v0 full")(Relational.topK(10, Seq(col("jaccard").desc),
        Seq(col("id_a"), col("id_b")))(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3)))
      time("v1 full")(Relational.topK(10, Seq(col("jaccard").desc),
        Seq(col("id_a"), col("id_b")))(v1(docs, 0.0)))
      time("v0 0.8")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8))
      time("v1 0.8")(v1(docs, 0.8))
    }
    spark.stop()
  }
}
