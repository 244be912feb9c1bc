package graft.plans

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Gopher-style intra-document repetition signals (Rae et al. 2021,
  * appendix A1.1; the same family DataTrove/Dolma ship as
  * "GopherRepetitionFilter") in ONE pass per document — map-only, no
  * shuffle, so the filter runs inline in any 100 TB scan. The existing
  * [[graft.functions.Text.repetitionRatio]] is the unigram signal;
  * this kernel adds the n-gram ones the unigram ratio cannot see
  * (boilerplate that cycles a few phrases has near-zero unigram
  * repetition but a large duplicate-n-gram mass).
  *
  * Definitions (shared verbatim with the DuckDB oracle of
  * `q_gopher_repetition`):
  *
  *   - tokens: maximal runs of non-whitespace (`\s` = ASCII
  *     [ \t\n\x0B\f\r], the same runs `Text.tokens(normWs)` yields)
  *     of the LOWERCASED text; `total_chars` = sum of token lengths
  *     in code points (separators never count);
  *   - an n-gram is n consecutive tokens; its identity is the tokens
  *     joined by one space (tokens cannot contain spaces, so the join
  *     is injective); its char length is the sum of its tokens' code
  *     point counts;
  *   - top-n-gram fraction (n = 2, 3, 4): occurrences(top) *
  *     charlen(top) / total_chars, where the top gram has the highest
  *     occurrence count, ties broken by lexicographically smallest
  *     gram string — a deterministic tie-break both engines can
  *     reproduce (fixtures are ASCII, where UTF-16 and UTF-8 binary
  *     orders agree);
  *   - duplicate-n-gram fraction (n = 5..10): the fraction of
  *     `total_chars` covered by tokens lying inside at least one
  *     occurrence of a gram that occurs >= 2 times. Coverage is a
  *     UNION of token-index intervals — overlapping occurrences never
  *     double-count a token (the subtlety the naive
  *     sum-of-duplicate-masses form gets wrong);
  *   - alpha-word fraction: tokens containing >= 1 code point with
  *     `Character.isLetter` / total tokens (the Gopher "80% of words
  *     must contain at least one alphabetic character" rule's input).
  *
  * Zero tokens (or T < n) yields 0.0 for every affected signal.
  */
object RepetitionStatsUtil {

  val TOP_NS: Array[Int] = Array(2, 3, 4)
  val DUP_NS: Array[Int] = Array(5, 6, 7, 8, 9, 10)
  /** Output slots: top2,top3,top4, dup5..dup10, alpha_frac. */
  val WIDTH: Int = TOP_NS.length + DUP_NS.length + 1

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Returns Array[Double](WIDTH); see slot layout above. */
  def stats(raw: String): Array[Double] = {
    val out = new Array[Double](WIDTH)
    val s = raw.toLowerCase(Locale.ROOT)
    val n = s.length

    // token spans (start, end) — one scan
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    var i = 0
    var tokStart = -1
    while (i < n) {
      if (isWs(s.charAt(i))) {
        if (tokStart >= 0) {
          if (nTok == starts.length) {
            starts = java.util.Arrays.copyOf(starts, nTok * 2)
            ends = java.util.Arrays.copyOf(ends, nTok * 2)
          }
          starts(nTok) = tokStart; ends(nTok) = i; nTok += 1
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    if (tokStart >= 0) {
      if (nTok == starts.length) {
        starts = java.util.Arrays.copyOf(starts, nTok * 2)
        ends = java.util.Arrays.copyOf(ends, nTok * 2)
      }
      starts(nTok) = tokStart; ends(nTok) = n; nTok += 1
    }
    if (nTok == 0) return out

    // per-token code point counts + total
    val tokCp = new Array[Int](nTok)
    var totalChars = 0L
    i = 0
    while (i < nTok) {
      val cp = s.codePointCount(starts(i), ends(i))
      tokCp(i) = cp
      totalChars += cp
      i += 1
    }

    // alpha-word fraction
    var alphaWords = 0
    i = 0
    while (i < nTok) {
      var j = starts(i)
      var hit = false
      while (!hit && j < ends(i)) {
        val cp = s.codePointAt(j)
        if (Character.isLetter(cp)) hit = true
        j += Character.charCount(cp)
      }
      if (hit) alphaWords += 1
      i += 1
    }
    out(WIDTH - 1) = alphaWords.toDouble / nTok

    if (totalChars == 0L) return out // pathological: tokens of 0 cps

    val covered = new Array[Boolean](nTok)
    val grams = new Array[String](nTok)
    var slot = 0
    var ni = 0
    while (ni < TOP_NS.length + DUP_NS.length) {
      val isTop = ni < TOP_NS.length
      val g = if (isTop) TOP_NS(ni) else DUP_NS(ni - TOP_NS.length)
      val nGrams = nTok - g + 1
      if (nGrams > 0) {
        val counts = new java.util.HashMap[String, Integer](nGrams * 2)
        i = 0
        while (i < nGrams) {
          val sb = new java.lang.StringBuilder(
            ends(i + g - 1) - starts(i))
          var k = 0
          while (k < g) {
            if (k > 0) sb.append(' ')
            sb.append(s, starts(i + k), ends(i + k))
            k += 1
          }
          val key = sb.toString
          grams(i) = key
          val c = counts.get(key)
          counts.put(key, if (c == null) 1 else c + 1)
          i += 1
        }
        if (isTop) {
          // argmax by (count desc, gram asc); mass = count * charlen
          var bestGram: String = null
          var bestCount = 0
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue.intValue()
            if (c > bestCount ||
              (c == bestCount && e.getKey.compareTo(bestGram) < 0)) {
              bestCount = c; bestGram = e.getKey
            }
          }
          // gram code points minus the (g-1) single-space separators
          val gramCp = bestGram.codePointCount(0, bestGram.length) - (g - 1)
          out(slot) = bestCount.toDouble * gramCp / totalChars
        } else {
          java.util.Arrays.fill(covered, 0, nTok, false)
          i = 0
          while (i < nGrams) {
            if (counts.get(grams(i)) >= 2) {
              var k = i
              val lim = i + g
              while (k < lim) { covered(k) = true; k += 1 }
            }
            i += 1
          }
          var cov = 0L
          i = 0
          while (i < nTok) {
            if (covered(i)) cov += tokCp(i)
            i += 1
          }
          out(slot) = cov.toDouble / totalChars
        }
      }
      slot += 1
      ni += 1
    }
    out
  }

  def statsArrayData(raw: String): GenericArrayData =
    new GenericArrayData(stats(raw))
}

/** repetition_stats(text): [top2, top3, top4, dup5..dup10, alpha_frac]
  * as array<double> in one scan. Null text -> null. */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    RepetitionStatsUtil.statsArrayData(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val util = RepetitionStatsUtil.getClass.getName.stripSuffix("$") +
        "$.MODULE$"
      s"${ev.value} = $util.statsArrayData($x.toString());"
    })

  override def prettyName: String = "repetition_stats"
  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  def repetitionStats(text: Column): Column =
    Bridge.toColumn(RepetitionStats(Bridge.toExpression(text)))
}
