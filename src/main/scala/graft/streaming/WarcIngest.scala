package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType, TimestampType}

/** Streaming twin of the file-level WARC front door (r14) — the
  * [[HtmlIngest]] landing pattern applied to ARCHIVES: a crawler
  * drops `.warc.gz` files into a directory, a `binaryFile` file
  * stream picks each file up exactly once, and
  * [[graft.llm.Warc.warcContentRecords]] decodes it to the same
  * per-record rows the batch `warcFiles` reader produces (shared
  * decode walk, so parity is by construction — and pinned
  * row-for-row by WarcIngestSpec).
  *
  * Like [[HtmlIngest]], the stage has ZERO streaming state: no
  * watermark, no shuffle, no stateful operator — per-batch work is
  * the map-only record decode, so ingest throughput equals the scan
  * throughput the batch probe measured, and checkpointing costs only
  * the file-source log. At scale the unit of parallelism is the
  * archive file, exactly as in batch; `maxFilesPerTrigger` bounds a
  * micro-batch. The `binaryFile` source materializes whole-file
  * content (O(file) memory per task) — size landing archives to the
  * usual ~1 GB Common-Crawl shape; multi-GB archives belong to the
  * batch `warcFiles` path, whose portable streams stay O(record). */
object WarcIngest {

  /** The `binaryFile` source's fixed schema (file streams require an
    * explicit schema). */
  val binarySchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** File-drop stream over an archive landing directory: one row per
    * WARC record of every newly-arrived file. */
  def warcDirRecords(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 4): DataFrame =
    graft.llm.Warc.warcContentRecords(
      spark.readStream
        .format("binaryFile")
        .schema(binarySchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .load(path))
}
