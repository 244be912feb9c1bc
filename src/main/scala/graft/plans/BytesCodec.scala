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

object BytesCodecExpr {
  def gzipBytes(b: Column): Column =
    Bridge.toColumn(GzipBytes(Bridge.toExpression(b)))
  def gunzipBytes(b: Column): Column =
    Bridge.toColumn(GunzipBytes(Bridge.toExpression(b)))
}
