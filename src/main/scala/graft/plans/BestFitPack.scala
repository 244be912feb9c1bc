package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Shared best-fit-decreasing kernel (static so codegen and the
  * interpreted path run the same bytes, like [[WinnowUtil]]): one pass
  * over the walk-ordered token counts, scanning the open-pack loads
  * for the fullest pack that still fits (first index on ties — the
  * same tie-break as the aggregate-HOF form this replaces, whose
  * `array_position(loads, array_max(feasible))` resolves to the lowest
  * pack id among the fullest). Per-doc cost is O(#open packs) with a
  * primitive-array scan — the HOF form was the same asymptotically but
  * ran filter/transform/concat through the interpreted Catalyst
  * evaluator, rebuilding both accumulator arrays per element
  * (measured 3.4× wall at 10× docs; see SCALING.md). */
object BestFitUtil {
  def assign(ns: ArrayData, budget: Long): GenericArrayData = {
    val len = ns.numElements()
    val packs = new Array[Int](len)
    var loads = new Array[Long](math.max(16, 1))
    var nPacks = 0
    var i = 0
    while (i < len) {
      // a null token count behaves like an oversize doc: its own pack,
      // never backfilled (mirrors the HOF, where null poisoned the
      // feasibility predicate)
      val n = if (ns.isNullAt(i)) Long.MaxValue else ns.getLong(i)
      var best = -1
      var bestLoad = -1L
      var j = 0
      while (j < nPacks) {
        val l = loads(j)
        // n <= budget - l, not l + n <= budget: no overflow when an
        // oversize pack carries a load beyond the budget
        if (n <= budget - l && l > bestLoad) { best = j; bestLoad = l }
        j += 1
      }
      if (best < 0) {
        if (nPacks == loads.length)
          loads = java.util.Arrays.copyOf(loads, loads.length * 2)
        loads(nPacks) = n
        packs(i) = nPacks
        nPacks += 1
      } else {
        loads(best) += n
        packs(i) = best
      }
      i += 1
    }
    new GenericArrayData(packs)
  }
}

/** best_fit_packs(n_tokens_in_walk_order, budget): 0-based pack id per
  * position under the best-fit-decreasing rule. Null array -> null;
  * null elements get singleton packs. */
case class BestFitPackIds(child: Expression, budget: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if budget > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"best_fit_packs expects (array<bigint>, budget>0), got " +
        s"${t.catalogString}, budget=$budget")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BestFitUtil.assign(input.asInstanceOf[ArrayData], budget)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val util = BestFitUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $util.assign($x, ${budget}L);"
    })

  override def prettyName: String = "best_fit_packs"
  override protected def withNewChildInternal(newChild: Expression): BestFitPackIds =
    copy(child = newChild)
}

object BestFitPack {
  def bestFitPackIds(nTokens: Column, budget: Long): Column =
    Bridge.toColumn(BestFitPackIds(Bridge.toExpression(nTokens), budget))
}
