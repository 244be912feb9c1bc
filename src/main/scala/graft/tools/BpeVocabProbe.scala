package graft.tools

import graft.Tables
import graft.llm.Bpe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-5 probe (not library surface): BPE training at VOCABULARY
  * scale — the incremental-delta trainer vs the definitional
  * full-recount trainer. Two phases:
  *
  *  1. real sf documents (small word table — the graded regime);
  *  2. a synthetic 2M-distinct-word table (md5 hex "words" — the
  *     regime where production vocabularies live), where full recount
  *     pays a ~70M-row positions explode + shuffle agg PER MERGE while
  *     the incremental trainer pays a codegen'd containment scan plus
  *     aggregation over affected words only.
  *
  * Also asserts the two trainers emit identical merge prefixes (the
  * spec proves it at 25 merges; this re-proves it at 100 on data that
  * exercises hot pairs). */
object BpeVocabProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nMerges = if (args.length > 1) args(1).toInt else 1000
    // table-size slope runs: phase-2 word count and recount merges are
    // overridable (recount at >2M words costs ~15 s/merge — keep small)
    val phase2Words = if (args.length > 2) args(2).toLong else 2000000L
    val recountMerges = if (args.length > 3) args(3).toInt else 20
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timed(label: String)(f: => Seq[(String, String, Long)])
        : Seq[(String, String, Long)] = {
      val t0 = System.nanoTime()
      val merges = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-38s ${dt}%9.1f s   merges=${merges.size}  " +
        f"(${dt / math.max(1, merges.size) * 1000}%7.1f ms/merge)")
      merges
    }

    // --- phase 1: real documents table ---
    val docs = Tables.load(spark, sfDir, "documents")
    println(s"phase 1: docs=${docs.count()} sfDir=$sfDir merges=$nMerges")
    val inc1 = timed(s"incremental train x$nMerges")(
      Bpe.trainIncremental(docs, "text", nMerges, minCount = 2L))
    val rec1 = timed("full-recount train x100")(
      Bpe.trainFullRecount(docs, "text", 100, minCount = 2L))
    val common1 = math.min(inc1.size, rec1.size)
    require(inc1.take(common1) == rec1.take(common1),
      "trainer mismatch on real docs!")
    println(s"phase 1 equivalence: first $common1 merges identical")

    // --- phase 2: synthetic vocabulary-scale word table ---
    // 2M distinct 32-char hex words, zipf-ish freq via id skew; text =
    // one word per row, so wordFreq is the table itself
    val vocab = spark.range(phase2Words)
      .select(md5(col("id").cast("string")).as("text"))
    println(s"phase 2: $phase2Words distinct synthetic words")
    val inc2 = timed(s"incremental train x$nMerges @$phase2Words words")(
      Bpe.trainIncremental(vocab, "text", nMerges, minCount = 2L))
    val rec2 = timed(s"full-recount train x$recountMerges @$phase2Words words")(
      Bpe.trainFullRecount(vocab, "text", recountMerges, minCount = 2L))
    val common2 = math.min(inc2.size, rec2.size)
    require(inc2.take(common2) == rec2.take(common2),
      "trainer mismatch on synthetic vocab!")
    println(s"phase 2 equivalence: first $common2 merges identical")
    spark.stop()
  }
}
