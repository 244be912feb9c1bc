package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert curve index as a native codegen kernel — the layout
  * clustering key with STRICT locality: consecutive curve positions
  * are always grid neighbors (|dx|+|dy| = 1, spec-asserted over the
  * full grid), where the Morton/Z curve takes long diagonal jumps at
  * every power-of-two boundary. For file clustering that means a
  * contiguous Hilbert range is one compact tile — per-file min/max
  * ranges stay tight in BOTH dimensions with none of Z's
  * boundary-straddling files (measured: q_hilbert_gate prunes below
  * the linear layout, and HilbertSpec pins the curve itself).
  *
  * Classic iterative form (rotate-and-accumulate over bit planes,
  * cf. the public-domain algorithm in Hamilton 2006 / Wikipedia):
  * O(bits) per row, no allocation, whole-stage-codegen'd. */
object HilbertUtil {
  /** Map grid cell (x, y) in [0, 2^bits)² to its curve position d in
    * [0, 4^bits). Caller guarantees the domain (Layout buckets do). */
  def xy2d(bits: Int, xIn: Long, yIn: Long): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve orientation lines up
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse (curve position -> cell) — spec/measurement use. */
  def d2xy(bits: Int, dIn: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = dIn
    var s = 1L
    val n = 1L << bits
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}

/** hilbert_index(x, y): curve position of a bucketed (x, y) cell.
  * Null if either side is null. `bits` is per-dimension (d spans
  * 2*bits bits, so bits <= 31). */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index expects (bigint, bigint), got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertUtil.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = HilbertUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$util.xy2d($bits, $a, $b)")
  }

  override def prettyName: String = "hilbert_index"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  def hilbert(x: Column, y: Column, bits: Int): Column =
    Bridge.toColumn(HilbertIndex(Bridge.toExpression(x),
      Bridge.toExpression(y), bits))
}
