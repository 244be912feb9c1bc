package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset-aware body decode — between the WARC reader's raw bytes
  * and [[HtmlTextUtil]]: a large minority of the web is NOT UTF-8
  * (the reference's Polish/Dutch outlets — `Deliverable_2/Batch Data
  * Codes/variables_dict.json` — are exactly the windows-125x /
  * ISO-8859 risk corpus), and a blind UTF-8 cast mojibakes every
  * such page before text extraction can see it.
  *
  * Charset resolution, pinned (first hit wins):
  *   0. a byte-order mark (r14, WHATWG encoding-standard precedence:
  *      the BOM outranks even Content-Type) — EF BB BF → UTF-8,
  *      FE FF → UTF-16BE, FF FE → UTF-16LE; the BOM bytes strip
  *      from the decoded output (they are encoding metadata, not
  *      content — a retained U+FEFF poisons every downstream
  *      startsWith/trim/dedup key);
  *   1. the `charset=` parameter of the Content-Type value
  *      (case-insensitive name, value to ';' or end, quotes
  *      stripped);
  *   2. a bounded sniff of the body's first 1024 bytes for
  *      `charset=` ANCHORED to a <meta …> tag span (r14: the search
  *      is bounded to each "<meta"…">" region, so a URL or script
  *      text containing "charset=" can no longer hijack the decode)
  *      — covers both <meta charset="x"> and the http-equiv form
  *      <meta content="text/html; charset=x">; value = run of
  *      [A-Za-z0-9_:.-] after optional quote (charset names are
  *      ASCII, so scanning raw bytes as ISO-8859-1 is exact);
  *   3. UTF-8.
  * An unknown/unsupported charset name falls back to UTF-8; malformed
  * byte sequences decode to U+FFFD (java.lang.String's REPLACE
  * action) — decode is TOTAL, never an exception. */
object DecodeBodyUtil {

  private def charsetToken(s: String, from: Int): String = {
    var i = from
    val n = s.length
    while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
    if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) i += 1
    val st = i
    while (i < n && {
      val c = s.charAt(i)
      c.isLetterOrDigit || c == '_' || c == ':' || c == '.' || c == '-'
    }) i += 1
    if (i == st) null else s.substring(st, i)
  }

  private def findCharsetEq(s: String): String = {
    val lc = s.toLowerCase(java.util.Locale.ROOT)
    var k = lc.indexOf("charset")
    while (k >= 0) {
      var i = k + 7
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t'))
        i += 1
      if (i < s.length && s.charAt(i) == '=')
        return charsetToken(s, i + 1)
      // keep looking past a non-parameter "charset" occurrence
      k = lc.indexOf("charset", k + 7)
    }
    null
  }

  /** Rule-2 sniff: `charset=` only counts inside a <meta …> tag span
    * (case-insensitive "<meta" … '>' or window end), never in free
    * text. */
  private def findMetaCharset(prefix: String): String = {
    val lc = prefix.toLowerCase(java.util.Locale.ROOT)
    var m = lc.indexOf("<meta")
    while (m >= 0) {
      val gt = lc.indexOf('>', m)
      val end = if (gt < 0) lc.length else gt
      val name = findCharsetEq(prefix.substring(m, end))
      if (name != null) return name
      m = lc.indexOf("<meta", m + 5)
    }
    null
  }

  def decode(body: Array[Byte], contentType: String): String = {
    // rule 0: the BOM outranks everything, and strips
    if (body.length >= 3 && (body(0) & 0xff) == 0xEF &&
        (body(1) & 0xff) == 0xBB && (body(2) & 0xff) == 0xBF)
      return new String(body, 3, body.length - 3,
        java.nio.charset.StandardCharsets.UTF_8)
    if (body.length >= 2) {
      val b0 = body(0) & 0xff
      val b1 = body(1) & 0xff
      if (b0 == 0xFE && b1 == 0xFF)
        return new String(body, 2, body.length - 2,
          java.nio.charset.StandardCharsets.UTF_16BE)
      if (b0 == 0xFF && b1 == 0xFE)
        return new String(body, 2, body.length - 2,
          java.nio.charset.StandardCharsets.UTF_16LE)
    }
    var name: String =
      if (contentType == null || contentType.isEmpty) null
      else findCharsetEq(contentType)
    if (name == null && body.length > 0) {
      val prefix = new String(body, 0,
        math.min(body.length, 1024), "ISO-8859-1")
      name = findMetaCharset(prefix)
    }
    val cs =
      try {
        if (name == null) java.nio.charset.StandardCharsets.UTF_8
        else java.nio.charset.Charset.forName(name)
      } catch {
        case scala.util.control.NonFatal(_) =>
          java.nio.charset.StandardCharsets.UTF_8
      }
    new String(body, cs)
  }
}

/** decode_body(body binary, content_type string) -> string per
  * [[DecodeBodyUtil]]'s pinned resolution. Null body -> null; pass
  * content_type through the [[DecodeBodyExpr.decodeBody]] helper,
  * which coalesces a null Content-Type to '' so the sniff + UTF-8
  * fallback still runs (a bare BinaryExpression would null out). */
case class DecodeBody(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "decode_body expects (binary, string)")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(b: Any, ct: Any): Any =
    UTF8String.fromString(DecodeBodyUtil.decode(
      b.asInstanceOf[Array[Byte]], ct.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = DecodeBodyUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, (b, ct) =>
      s"${ev.value} = $utf8.fromString($util.decode($b, " +
        s"$ct.toString()));")
  }

  override def prettyName: String = "decode_body"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodeBody =
    copy(left = newLeft, right = newRight)
}

object DecodeBodyExpr {
  /** Null-tolerant front door: a missing Content-Type must still
    * sniff + fall back, so it coalesces to ''. */
  def decodeBody(body: Column, contentType: Column): Column =
    Bridge.toColumn(DecodeBody(Bridge.toExpression(body),
      Bridge.toExpression(coalesce(contentType, lit("")))))
}
