package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Single-pass text metrics, replacing the regex/HOF pipeline that
  * quality scoring otherwise runs per document (several `regexp_replace`
  * scans plus an interpreted higher-order stopword filter — measured
  * ~1 s per 5k-doc pass at sf0.1; this kernel is one scan of the
  * string). Semantics match the column forms in `functions.Text`
  * EXACTLY (TextStatsSpec proves equality against the original
  * regex/HOF implementations, including unicode and whitespace edges):
  *
  *   - token = maximal run of non-`\s` chars, `\s` being Java regex's
  *     ASCII set [ \t\n\f\r] — the same runs `split(normWs)`
  *     produces;
  *   - stopword test mirrors `tokens(lower(text)) IN <18 ASCII words>`:
  *     ASCII-case-insensitive equality suffices, because no full-Unicode
  *     lowercasing can turn a non-ASCII token into one of these
  *     k-free ASCII words (İ→i̇ keeps a combining dot; K→k would need a
  *     'k' in the word list);
  *   - body/punct counts are CODE POINTS of non-whitespace chars, punct
  *     being those outside `\p{L}` (Character.isLetter) and `\p{N}`
  *     (Nd | Nl | No) — exactly the regex categories.
  */
object TextStatsUtil {
  /** The stopwords of `functions.Text.stopwords`, ASCII lower case. */
  private val stopwords: Array[String] = Array(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "that", "this")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private def isStopword(s: String, from: Int, until: Int): Boolean = {
    val len = until - from
    if (len < 1 || len > 4) return false
    var i = 0
    while (i < stopwords.length) {
      val w = stopwords(i)
      if (w.length == len) {
        var j = 0
        var ok = true
        while (ok && j < len) {
          var c = s.charAt(from + j)
          if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
          ok = c == w.charAt(j)
          j += 1
        }
        if (ok) return true
      }
      i += 1
    }
    false
  }

  /** Returns [nTokens, nStopwordTokens, nBodyCodePoints, nPunctCodePoints]. */
  def stats(s: String): Array[Long] = {
    var nTok = 0L; var nStop = 0L; var nBody = 0L; var nPunct = 0L
    val n = s.length
    var i = 0
    var tokStart = -1
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) {
        if (tokStart >= 0) {
          nTok += 1
          if (isStopword(s, tokStart, i)) nStop += 1
          tokStart = -1
        }
        i += 1
      } else {
        if (tokStart < 0) tokStart = i
        val cp = s.codePointAt(i)
        nBody += 1
        val t = Character.getType(cp)
        val letterOrNum = Character.isLetter(cp) ||
          t == Character.DECIMAL_DIGIT_NUMBER ||
          t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
        if (!letterOrNum) nPunct += 1
        i += Character.charCount(cp)
      }
    }
    if (tokStart >= 0) {
      nTok += 1
      if (isStopword(s, tokStart, n)) nStop += 1
    }
    Array(nTok, nStop, nBody, nPunct)
  }
}

/** text_stats(text): [n_tokens, n_stopword_tokens, n_body_chars,
  * n_punct_chars] in one scan. Null text -> null. */
case class TextStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextStatsUtil.stats(input.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val util = TextStatsUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad($util.stats($x.toString()));"
    })

  override def prettyName: String = "text_stats"
  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStatsExpr {
  def textStats(text: Column): Column =
    Bridge.toColumn(TextStats(Bridge.toExpression(text)))
}
