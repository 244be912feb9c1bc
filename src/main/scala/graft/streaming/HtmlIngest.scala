package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Bronze HTML ingest as a STREAMING stage (round 12) — the r11
  * extraction kernels wired into the file-drop landing pattern of
  * [[Sources.jsonDirTicks]]: html_to_text + title/time metadata +
  * quality/repetition gates over a micro-batched page stream.
  *
  * Everything here is a map-only codegen expression, so the stage is
  * trigger-shaped work with ZERO state: no watermark, no shuffle, no
  * stateful operator — the batch and streaming plans are the same
  * projection+filter, which the parity spec pins row-for-row. At
  * scale that means ingest throughput is bounded by scan + codegen
  * alone, and a crawler's landing directory drains at the same
  * bytes/s the batch probe measured (~1.6 GB/s/core-set). */
object HtmlIngest {

  /** Landing-file schema: one JSON object per page. */
  val pageSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("fetched_at", StringType),
    StructField("url", StringType),
    StructField("html", StringType)))

  /** File-drop stream over a bronze HTML landing dir (the crawler's
    * dump directory) — the S10 pattern with the page schema. */
  def htmlDirPages(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(pageSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  /** The ingest transform — works identically on a batch or streaming
    * frame (no stateful operators): extract text/title/canonical URL,
    * gate on quality and repetition, drop markup-only pages. Columns
    * out: (doc_id, url_canon, title, text, quality, rep_ratio). */
  def ingest(pages: DataFrame, minQuality: Double = 0.2,
      maxRepetition: Double = 0.9): DataFrame =
    pages.select(col("doc_id"),
        graft.plans.UrlCanonExpr.urlCanon(col("url")).as("url_canon"),
        graft.plans.HtmlTextExpr.htmlTitle(col("html")).as("title"),
        graft.plans.HtmlTextExpr.htmlToText(col("html")).as("text"))
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .withColumn("quality",
        graft.functions.Text.qualityScore(col("text")))
      .withColumn("rep_ratio",
        graft.functions.Text.repetitionRatio(col("text")))
      .filter(col("quality") >= minQuality &&
        col("rep_ratio") <= maxRepetition)
}
