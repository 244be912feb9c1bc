package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** gzip / gunzip as column expressions — the compressed-payload
  * plumbing a crawl corpus needs inline: sitemaps are served as
  * sitemap.xml.gz, HTTP bodies arrive Content-Encoding: gzip, and a
  * pipeline that round-trips compressed columns should do it inside
  * whole-stage codegen, not in a driver loop.
  *
  * gunzip_bytes delegates to [[graft.llm.Warc.gunzip]]: the SAME
  * bounded multi-member decoder (512 MB cap, eager native-inflater
  * close — the >7x finalizer trap), null on corruption or cap
  * breach, never an exception. gzip_bytes uses java.util.zip with
  * its all-zero MTIME header, so output is deterministic for a given
  * input within a JVM. Null in -> null out for both. */
object BytesCodecUtil {

  def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(
      math.max(64, b.length / 3))
    var out: java.util.zip.GZIPOutputStream = null
    try {
      out = new java.util.zip.GZIPOutputStream(bos)
      out.write(b)
      out.close() // flush + free the native deflater NOW
      out = null
      bos.toByteArray
    } finally if (out != null)
      try out.close()
      catch { case scala.util.control.NonFatal(_) => () }
  }

  def gunzip(b: Array[Byte]): Array[Byte] =
    graft.llm.Warc.gunzip(b).orNull

  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  /** RFC 4648 §6 base32, UNPADDED uppercase — the encoding WARC
    * payload digests actually use (`sha1:` + base32 of the 20 SHA-1
    * bytes = exactly 32 chars, so padding never appears in the wild
    * for digests; for other lengths the '=' padding is simply
    * omitted, like Common Crawl's own writers do). Empty -> "". */
  def base32(b: Array[Byte]): String = {
    val n = b.length
    val sb = new java.lang.StringBuilder((n * 8 + 4) / 5)
    var acc = 0L
    var bits = 0
    var i = 0
    while (i < n) {
      acc = (acc << 8) | (b(i) & 0xffL)
      bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(B32.charAt(((acc >> bits) & 0x1f).toInt))
      }
      i += 1
    }
    if (bits > 0)
      sb.append(B32.charAt(((acc << (5 - bits)) & 0x1f).toInt))
    sb.toString
  }
}

/** gzip_bytes(binary) -> binary. */
case class GzipBytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gzip_bytes expects binary, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BytesCodecUtil.gzip(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = BytesCodecUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $util.gzip($x);")
  }

  override def prettyName: String = "gzip_bytes"
  override protected def withNewChildInternal(newChild: Expression): GzipBytes =
    copy(child = newChild)
}

/** gunzip_bytes(binary) -> binary; null on corrupt input or cap
  * breach (reject, don't guess). */
case class GunzipBytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gunzip_bytes expects binary, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BytesCodecUtil.gunzip(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = BytesCodecUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, x => {
      s"""
        |${ev.value} = $util.gunzip($x);
        |${ev.isNull} = ${ev.value} == null;
      """.stripMargin
    })
  }

  override def prettyName: String = "gunzip_bytes"
  override protected def withNewChildInternal(newChild: Expression): GunzipBytes =
    copy(child = newChild)
}

/** base32_bytes(binary) -> string — RFC 4648 unpadded uppercase (see
  * [[BytesCodecUtil.base32]]); with sha1 this reproduces the WARC
  * payload-digest encoding: concat('sha1:', base32(unhex(sha1(b)))).
  * Null -> null. */
case class Base32Bytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"base32_bytes expects binary, got ${child.dataType.catalogString}")

  override def dataType: DataType =
    org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      BytesCodecUtil.base32(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = BytesCodecUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val utf8 = classOf[org.apache.spark.unsafe.types.UTF8String].getName
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = $utf8.fromString($util.base32($x));")
  }

  override def prettyName: String = "base32_bytes"
  override protected def withNewChildInternal(newChild: Expression): Base32Bytes =
    copy(child = newChild)
}

object BytesCodecExpr {
  def gzipBytes(b: Column): Column =
    Bridge.toColumn(GzipBytes(Bridge.toExpression(b)))
  def gunzipBytes(b: Column): Column =
    Bridge.toColumn(GunzipBytes(Bridge.toExpression(b)))
  def base32Bytes(b: Column): Column =
    Bridge.toColumn(Base32Bytes(Bridge.toExpression(b)))

  /** The WARC payload-digest encoding in one call:
    * 'sha1:' + base32(SHA-1(b)) — what a pipeline compares against
    * the lifted WARC-Payload-Digest to verify transport/dechunk
    * integrity. Opt-in BY DESIGN: hashing every payload at 100 TB is
    * real CPU, so the reader never does it silently. */
  def warcSha1Digest(b: Column): Column = {
    import org.apache.spark.sql.functions.{concat, lit, sha1, unhex}
    concat(lit("sha1:"), base32Bytes(unhex(sha1(b))))
  }
}
