package graft.tools

import graft.llm.Bpe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-7 probe (not library surface): applying a trained merge list
  * to the word table — the compiled one-pass kernel
  * ([[graft.plans.BpeApplyMerges]]) vs the definitional
  * layer-per-merge fold ([[Bpe.applyMergesFold]], localCheckpoint
  * every 64 layers). The fold's cost is merges x table (and 1/64th of
  * the merges pay a full-table materialization); the kernel compiles
  * the whole list into one projection whose per-word cost is
  * O(merges-present-check + touched x len). Asserts identical total
  * subword counts (row-level equality is BpeSpec's job; this probe
  * exists for the wall clock at a 2M-word table). */
object R7BpeApplyProbe {
  def main(args: Array[String]): Unit = {
    val nMerges = if (args.nonEmpty) args(0).toInt else 1024
    val foldMerges = if (args.length > 1) args(1).toInt else 128
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val vocab = spark.range(2000000L)
      .select(md5(col("id").cast("string")).as("text"))
    val syms = Bpe.initSymbols(Bpe.wordFreq(vocab, "text")).localCheckpoint()
    println(s"words=${syms.count()}")
    // synthetic but structurally-valid rank-ordered merges over the hex
    // alphabet: all 256 bigrams, then trigram extensions
    val hex = "0123456789abcdef".map(_.toString)
    val bigrams = for (a <- hex; b <- hex) yield (a, b)
    val trigrams = for ((a, b) <- bigrams.take(64); c <- hex) yield (a + b, c)
    val merges = (bigrams ++ trigrams).take(nMerges)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    def sumSizes(df: org.apache.spark.sql.DataFrame): Long =
      df.selectExpr("sum(size(symbols))").head().getLong(0)

    val kSmall = timed(s"kernel applyMerges x$foldMerges") {
      sumSizes(syms.withColumn("symbols",
        graft.plans.BpeChunk.applyMerges(col("symbols"),
          merges.take(foldMerges))))
    }
    val kFull = timed(s"kernel applyMerges x$nMerges") {
      sumSizes(syms.withColumn("symbols",
        graft.plans.BpeChunk.applyMerges(col("symbols"), merges)))
    }
    val fSmall = timed(s"fold   applyMerges x$foldMerges") {
      val r = sumSizes(Bpe.applyMergesFold(syms, merges.take(foldMerges)))
      Bpe.releaseCaches(); r
    }
    println(s"total-subword parity at x$foldMerges: kernel=$kSmall " +
      s"fold=$fSmall equal=${kSmall == fSmall}; kernel x$nMerges=$kFull")
    require(kSmall == fSmall, "kernel/fold subword-count mismatch")
    spark.stop()
  }
}
