package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string — the compression-ratio
  * quality signal (deflate_len / byte_len) the RefinedWeb/MassiveText
  * style pipelines use as a cheap redundancy screen: templated or
  * repetition-heavy boilerplate compresses far below prose (a
  * same-line-repeated spam page lands near 0.05; natural text sits
  * roughly 0.4-0.7; base64/random blobs exceed 1 as DEFLATE adds
  * framing without finding structure). Complements the exact n-gram
  * repetition kernel ([[RepetitionStats]]): gzip-ratio catches
  * LONG-RANGE and approximate redundancy a bounded n-gram window
  * cannot.
  *
  * Map-only, one pass over the UTF-8 bytes, no per-row allocations
  * beyond the deflater's fixed 32 KB window. Level 6 / raw-deflate
  * (nowrap): the ratio is a FEATURE, so the zlib header/trailer would
  * only add a constant the short-document end misreads. The java.util
  * .zip deflater is deterministic for a fixed level + input, so the
  * emitted lengths are stable across runs and engines.
  */
object CompressUtil {
  /** Raw-DEFLATE (nowrap, level 6) byte length of s's UTF-8 bytes.
    * Empty string deflates to the 2-byte empty stored block. */
  def deflatedLen(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** deflate_len(text): raw-DEFLATE compressed byte length. Null -> null. */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    CompressUtil.deflatedLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val util = CompressUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $util.deflatedLen($x);"
    })

  override def prettyName: String = "deflate_len"
  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object CompressExpr {
  def deflateLen(text: Column): Column =
    Bridge.toColumn(DeflateLen(Bridge.toExpression(text)))

  /** deflate_len / utf-8 byte length; null-length-0 guarded (empty
    * text reports ratio 0 rather than a division null). */
  def deflateRatio(text: Column): Column = {
    import org.apache.spark.sql.functions._
    when(octet_length(text) > 0,
      deflateLen(text).cast("double") / octet_length(text))
      .otherwise(0.0)
  }
}
