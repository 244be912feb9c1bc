package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** Jaro-Winkler string similarity as a native codegen kernel — the
  * fuzzy-match metric of record linkage (Winkler 1990, census
  * name-matching): order-sensitive like Levenshtein but cheap
  * (O(len·window), no DP matrix) and with the empirically-motivated
  * common-prefix boost that makes it the standard name/title matcher.
  * Complements the blocked-Levenshtein pair join (entity resolution
  * picks per-field metrics; JW for names, edit distance for codes).
  *
  * Semantics are pinned against the oracle engine's
  * `jaro_winkler_similarity` byte-for-byte (q_jw_pairs):
  *  - either side empty -> 0.0 (NOT 1.0 for two empties);
  *  - match window = max(l1,l2)/2 - 1 (integer floor, min 0);
  *  - transpositions = half the aligned-match mismatches;
  *  - Winkler prefix boost (p = 0.1, prefix capped at 4) applied only
  *    when the Jaro score exceeds the 0.7 boost threshold;
  *  - case-sensitive, computed over Unicode code points.
  *
  * A Scala UDF would compute the same thing ~uncodegen'd; this kernel
  * keeps the pair-scoring loop inside whole-stage codegen where the
  * blocked join's filter runs (the [[TextStats]] pattern).
  */
object JaroWinklerUtil {
  /** 0.7 Winkler boost threshold, 0.1 prefix weight, prefix cap 4. */
  def sim(s1: String, s2: String): Double = {
    val a = toCodePoints(s1)
    val b = toCodePoints(s2)
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window, l2 - 1)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the two matched subsequences in order and
    // count aligned pairs that disagree; each swap shows up twice
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val cap = math.min(4, math.min(l1, l2))
    while (prefix < cap && a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  private def toCodePoints(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val out = new Array[Int](n)
    var i = 0
    var j = 0
    while (j < n) {
      val cp = s.codePointAt(i)
      out(j) = cp
      i += Character.charCount(cp)
      j += 1
    }
    out
  }
}

/** jaro_winkler(a, b): Jaro-Winkler similarity in [0, 1]. Null if
  * either side is null. */
case class JaroWinklerSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.sim(a.toString, b.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = JaroWinklerUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev,
      (a, b) => s"$util.sim($a.toString(), $b.toString())")
  }

  override def prettyName: String = "jaro_winkler"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.toColumn(JaroWinklerSim(Bridge.toExpression(a), Bridge.toExpression(b)))
}
