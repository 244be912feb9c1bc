package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content sniffing by magic bytes — the triage stage a multimodal
  * corpus needs because SERVERS LIE: a large fraction of crawled
  * payloads carry a wrong or missing Content-Type, and routing an
  * MP4 into the HTML decoder (or vice versa) poisons both pipelines.
  * This is the WHATWG MIME-sniffing standard's byte-pattern core
  * (the "identify an unknown MIME type" table), pinned to the
  * signatures below — deliberately a SUBSET: no scriptable-vs-plain
  * distinction, no feed detection.
  *
  * Contract (first match wins, one bounded forward scan, total):
  *   1. binary signatures at offset 0: "%PDF-" → application/pdf;
  *      FF D8 FF → image/jpeg; the 8-byte PNG magic → image/png;
  *      "GIF87a"/"GIF89a" → image/gif; 1F 8B → application/gzip;
  *      "PK\x03\x04" → application/zip; "OggS" → application/ogg;
  *      "ID3" → audio/mpeg;
  *   2. RIFF containers: "RIFF" at 0 + "WEBP"/"WAVE"/"AVI " at 8 →
  *      image/webp / audio/wav / video/x-msvideo;
  *   3. ISO-BMFF: "ftyp" at offset 4 → video/mp4;
  *   4. text signatures after skipping an optional UTF-8 BOM and
  *      ASCII whitespace (the WHATWG rule): case-insensitive
  *      "<!doctype html" or "<html" → text/html; "<?xml" →
  *      application/xml;
  *   5. anything else → null — UNKNOWN, never a guess; the caller
  *      coalesces with the declared Content-Type.
  * Only the first 64 bytes are ever examined (plus the whitespace
  * skip, capped at 1024), so the kernel costs O(1) per row no matter
  * the payload size. */
object SniffMimeUtil {

  private def has(b: Array[Byte], off: Int, sig: String): Boolean = {
    if (off + sig.length > b.length) return false
    var i = 0
    while (i < sig.length) {
      if ((b(off + i) & 0xff) != sig.charAt(i)) return false
      i += 1
    }
    true
  }

  private def hasCi(b: Array[Byte], off: Int, sig: String): Boolean = {
    if (off + sig.length > b.length) return false
    var i = 0
    while (i < sig.length) {
      if (Character.toLowerCase((b(off + i) & 0xff).toChar) !=
        sig.charAt(i)) return false
      i += 1
    }
    true
  }

  def sniff(b: Array[Byte]): String = {
    if (b == null || b.length < 2) return null
    if (has(b, 0, "%PDF-")) return "application/pdf"
    if (b.length >= 3 && (b(0) & 0xff) == 0xFF && (b(1) & 0xff) == 0xD8 &&
      (b(2) & 0xff) == 0xFF) return "image/jpeg"
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && has(b, 1, "PNG") &&
      (b(4) & 0xff) == 0x0D && (b(5) & 0xff) == 0x0A &&
      (b(6) & 0xff) == 0x1A && (b(7) & 0xff) == 0x0A) return "image/png"
    if (has(b, 0, "GIF87a") || has(b, 0, "GIF89a")) return "image/gif"
    if ((b(0) & 0xff) == 0x1F && (b(1) & 0xff) == 0x8B)
      return "application/gzip"
    if (b.length >= 4 && has(b, 0, "PK") && (b(2) & 0xff) == 0x03 &&
      (b(3) & 0xff) == 0x04) return "application/zip"
    if (has(b, 0, "OggS")) return "application/ogg"
    if (has(b, 0, "ID3")) return "audio/mpeg"
    if (has(b, 0, "RIFF")) {
      if (has(b, 8, "WEBP")) return "image/webp"
      if (has(b, 8, "WAVE")) return "audio/wav"
      if (has(b, 8, "AVI ")) return "video/x-msvideo"
    }
    if (has(b, 4, "ftyp")) return "video/mp4"
    // text sniff: optional UTF-8 BOM, then ASCII whitespace (capped)
    var i = 0
    if (b.length >= 3 && (b(0) & 0xff) == 0xEF && (b(1) & 0xff) == 0xBB &&
      (b(2) & 0xff) == 0xBF) i = 3
    val cap = math.min(b.length, i + 1024)
    while (i < cap && {
      val c = b(i) & 0xff
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0C
    }) i += 1
    if (hasCi(b, i, "<!doctype html") || hasCi(b, i, "<html"))
      return "text/html"
    if (hasCi(b, i, "<?xml")) return "application/xml"
    null
  }
}

/** sniff_mime(bytes): the payload's magic-byte MIME type per
  * [[SniffMimeUtil]]'s pinned table; null in -> null out, unknown ->
  * null (never a guess — coalesce with the declared Content-Type). */
case class SniffMime(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sniff_mime expects binary, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val r = SniffMimeUtil.sniff(input.asInstanceOf[Array[Byte]])
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = SniffMimeUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, x => {
      val tmp = ctx.freshName("mime")
      s"""
        |String $tmp = $util.sniff($x);
        |if ($tmp == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $utf8.fromString($tmp); }
      """.stripMargin
    })
  }

  override def prettyName: String = "sniff_mime"
  override protected def withNewChildInternal(newChild: Expression): SniffMime =
    copy(child = newChild)
}

object SniffMimeExpr {
  def sniffMime(bytes: Column): Column =
    Bridge.toColumn(SniffMime(Bridge.toExpression(bytes)))
}
