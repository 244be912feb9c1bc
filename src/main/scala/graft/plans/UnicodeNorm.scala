package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression. Multilingual
  * corpora carry the same text in composed (é = U+00E9) and decomposed
  * (e + U+0301) forms — byte-level fingerprints, shingles, span hashes
  * and exact dedup all treat those as DIFFERENT documents unless the
  * pipeline canonicalizes first, silently splitting duplicate groups.
  * Spark has no built-in normalizer; a UDF would break codegen — this
  * is the [[TextStats]]-style kernel instead.
  *
  * The fast path matters at 100 TB: `Normalizer.isNormalized` is a
  * forward scan that short-circuits on the first char with a nonzero
  * quick-check property — for the overwhelmingly-ASCII web corpus it
  * touches no allocation at all; only genuinely denormalized strings
  * pay the normalize pass. */
object UnicodeNormUtil {
  import java.text.Normalizer
  def nfc(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)

  /** Accent folding with DuckDB/utf8proc `strip_accents` semantics —
    * NFC(dropNonSpacingMarks(NFD(s))) — pinned against DuckDB
    * directly: 'áçñ'→'acn', '한' survives Jamo round-trip (the NFC
    * recompose is load-bearing: without it Hangul comes back as
    * decomposed Jamo and the engines diverge), non-decomposables
    * (ø, Ω, ligatures) pass through. The ASCII fast path is a bare
    * char scan with no allocation — the common web-corpus case. */
  def foldAccents(s: String): String = {
    var i = 0
    while (i < s.length && s.charAt(i) < 0x80) i += 1
    if (i == s.length) return s
    val nfd = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
  }
}

/** nfc_normalize(text): canonical-composition (NFC) form. Null -> null. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(UnicodeNormUtil.nfc(input.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val util = UnicodeNormUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val utf8 = classOf[UTF8String].getName
      s"${ev.value} = $utf8.fromString($util.nfc($x.toString()));"
    })

  override def prettyName: String = "nfc_normalize"
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** accent_fold(text): diacritic removal for dedup canonicalization —
  * 'Café' and 'Cafe' must land in the same duplicate cluster when a
  * pipeline folds accents, and the fold must agree byte-for-byte with
  * the oracle engine's `strip_accents` (q_accent_fold pins that).
  * Null -> null. Same kernel pattern as [[NfcNormalize]]. */
case class AccentFold(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"accent_fold expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(UnicodeNormUtil.foldAccents(input.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val util = UnicodeNormUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val utf8 = classOf[UTF8String].getName
      s"${ev.value} = $utf8.fromString($util.foldAccents($x.toString()));"
    })

  override def prettyName: String = "accent_fold"
  override protected def withNewChildInternal(newChild: Expression): AccentFold =
    copy(child = newChild)
}

object UnicodeNormExpr {
  def nfcNormalize(text: Column): Column =
    Bridge.toColumn(NfcNormalize(Bridge.toExpression(text)))

  def accentFold(text: Column): Column =
    Bridge.toColumn(AccentFold(Bridge.toExpression(text)))
}
