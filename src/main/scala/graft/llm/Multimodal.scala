package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: media
  * (image/audio/video) ride as opaque `binary` columns with typed
  * metadata; decode / feature-extraction runs partition-batched.
  *
  * The decode kernels themselves are STUBS (no media libraries in this
  * container — deterministic fakes clearly marked below); everything
  * Spark-side is real and tested: schema, partitioning, batch shape,
  * null/corrupt handling.
  *
  * Scale design: media bytes never enter a shuffle — decode happens in a
  * narrow `mapPartitions` projection before any wide op; downstream
  * stages carry only the small extracted features. Partition sizing is
  * the caller's lever (`repartition(n)` upstream; at 100 TB size input
  * splits so a partition's batch of decoded frames fits executor
  * memory).
  */
object Multimodal {

  /** Typed metadata accompanying every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("decode_ok", BooleanType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decode kernel — deterministic fake standing in for a real
    * image/audio decoder (no media libs in this container). Real
    * implementation would decode `payload` and pool pixel/spectral
    * features; the fake hashes byte windows so output is stable,
    * shaped correctly (`dim` floats), and corrupt-input behavior
    * (null/empty → decode_ok=false) is exercised for real. */
  private[llm] def decodeStub(payload: Array[Byte], dim: Int): Option[Array[Float]] =
    if (payload == null || payload.isEmpty) None
    else Some(Array.tabulate(dim) { i =>
      var h = 1125899906842597L
      var j = i % math.max(1, payload.length)
      val step = math.max(1, payload.length / 16)
      while (j < payload.length) {
        h = 31 * h + payload(j)
        j += step
      }
      ((h % 1000L).toFloat) / 1000.0f
    })

  /** Partition-batched decode+featurize: binary in, small feature row
    * out. One pass, no shuffle, media bytes dropped immediately after
    * decode. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media
      .select("media_id", "media_type", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val tpe = r.getString(1)
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          val nBytes = if (payload == null) 0L else payload.length.toLong
          decodeStub(payload, dim) match {
            case Some(f) => Row(id, tpe, nBytes, true, f.toSeq)
            case None => Row(id, tpe, nBytes, false, null)
          }
        }
      }(enc)
  }

  /** Image-resize plumbing: recompute typed dimension metadata for a
    * target box (aspect-preserving fit) and pass the payload through the
    * STUB transcode. The geometry math is real and tested; only the
    * pixel operation is faked (no imaging libs in this container). */
  def resizeImages(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height"),
      lit(1.0))
    media.filter(col("media_type") === "image" &&
        col("width").isNotNull && col("height").isNotNull &&
        col("width") > 0 && col("height") > 0)
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
      // STUB transcode: a real impl decodes+rescales payload bytes here
      .withColumn("out_payload", col("payload"))
      .select("media_id", "out_width", "out_height", "out_payload")
  }

  /** Video frame-sampling plumbing: emit one row per sampled frame
    * index (every `everyMs` within duration) — the decode of each frame
    * is the same stub. Shows the explode-then-decode shape without
    * shuffling payloads: the payload column is carried into the explode
    * but dropped in the same projection. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media
      // duration_ms > 0 also guards the sequence() bounds: duration 0
      // would make (start 0, stop -1, step +everyMs) illegal at runtime
      .filter(col("media_type") === "video" && col("duration_ms") > 0)
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)))
          .as("frame_ms"))
      .select(col("media_id"), col("frame_ms"),
        length(col("payload")).cast("long").as("n_bytes"))

  /** 64-bit SimHash of a binary payload from its chunked xxhash64s —
    * near-duplicate detection for media blobs WITHOUT decoding them:
    * re-encodes/minor edits that leave most `chunkBytes`-sized chunks
    * identical produce signatures within a small hamming distance.
    * Map-only (length + substring + hash per chunk, one 8-byte
    * signature out; payload bytes never enter a shuffle). Null
    * signature for empty payloads. */
  def payloadSimhash(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload", chunkBytes: Int = 64): DataFrame = {
    val starts = when(length(col(payloadCol)) > 0,
      sequence(lit(1), length(col(payloadCol)), lit(chunkBytes)))
      .otherwise(array())
    media.select(col(idCol).as("id"),
        transform(starts,
          i => xxhash64(col(payloadCol).substr(i, lit(chunkBytes))))
          .as("__chunks"))
      .select(col("id"),
        graft.plans.VectorExpressions.simhash64(col("__chunks"))
          .as("simhash"))
  }

  /** Near-duplicate media pairs (hamming <= maxHamming over the chunk
    * simhash), via the same pigeonhole banding as text simhash dedup. */
  def payloadNearDups(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload", chunkBytes: Int = 64,
      maxHamming: Int = 6): DataFrame =
    graft.llm.Dedup.simhashNearDupsFromSig(
      payloadSimhash(media, idCol, payloadCol, chunkBytes)
        .filter(col("simhash").isNotNull),
      maxHamming)
}
