package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dynamic time warping with a Sakoe-Chiba band, as a native codegen
  * kernel — the series-similarity metric that tolerates local tempo
  * shifts (two usage curves with the same shape a day apart score
  * near-0 where Euclidean distance explodes). The pipeline uses:
  * clustering per-key activity profiles, near-dup detection over
  * metric series, template matching against a reference curve.
  *
  * Semantics: unit |a_i - b_j| step cost, moves (i-1,j), (i,j-1),
  * (i-1,j-1), total path cost returned (no normalization — callers
  * divide by len if they want a rate). The band is widened to
  * max(band, |len_a - len_b|) so unequal lengths stay feasible (the
  * standard Sakoe-Chiba adaptation); band <= 0 with equal lengths
  * degenerates to the diagonal L1 path. Either side null or empty ->
  * null.
  *
  * Cost is O(len · band) time — the band is what makes this a
  * 100 TB-safe projection kernel instead of an O(n²) DP: daily-grain
  * year series at band 7 is ~2.5k cells. Memory is O(len_b) per row
  * (two rolling DP rows allocated at full width; cells outside the
  * band are simply never touched — band-width rows would save bytes
  * on very long series but cost an index remap in the hot loop). A UDF
  * would compute the same thing outside whole-stage codegen; this is
  * the [[CompressExpr]] kernel pattern instead. */
object DtwUtil {
  def dist(a: Array[Double], b: Array[Double], band: Int): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return Double.NaN // mapped to null upstream
    val w = math.max(band, math.abs(la - lb))
    // two rolling rows over j in [max(0,i-w), min(lb-1,i+w)]
    val inf = Double.PositiveInfinity
    var prev = Array.fill(lb)(inf)
    var cur = Array.fill(lb)(inf)
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - w)
      val hi = math.min(lb - 1, i + w)
      java.util.Arrays.fill(cur, inf)
      var j = lo
      while (j <= hi) {
        val cost = math.abs(a(i) - b(j))
        val best =
          if (i == 0 && j == 0) 0.0
          else {
            var m = if (i > 0) prev(j) else inf // (i-1, j)
            if (j > 0 && cur(j - 1) < m) m = cur(j - 1) // (i, j-1)
            if (i > 0 && j > 0 && prev(j - 1) < m) m = prev(j - 1)
            m
          }
        cur(j) = cost + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(lb - 1)
  }
}

/** dtw_dist(a, b) over array<double> with a fixed Sakoe-Chiba band.
  * Null/empty either side -> null. */
case class DtwDistance(left: Expression, right: Expression, band: Int)
  extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dtw_dist expects array<double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val d = DtwUtil.dist(a.asInstanceOf[ArrayData].toDoubleArray(),
      b.asInstanceOf[ArrayData].toDoubleArray(), band)
    if (d.isNaN) null else d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val util = DtwUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val d = ctx.freshName("dtw")
      s"""double $d = $util.dist($a.toDoubleArray(), $b.toDoubleArray(), $band);
         |if (Double.isNaN($d)) { ${ev.isNull} = true; } else { ${ev.value} = $d; }
         |""".stripMargin
    })

  override def prettyName: String = "dtw_dist"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DtwDistance =
    copy(left = newLeft, right = newRight)
}

object DtwDistance {
  def dtw(a: Column, b: Column, band: Int): Column =
    Bridge.toColumn(DtwDistance(Bridge.toExpression(a),
      Bridge.toExpression(b), band))
}
