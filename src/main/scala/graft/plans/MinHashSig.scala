package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** minhash_sig(shingles, k): k-slot MinHash signature of a string array —
  * slot j is min over shingles of `xxhash64(shingle, j)` in Spark's
  * multi-arg chaining semantics: hashInt(j, hashUnsafeBytes(s, 42)).
  *
  * Bit-compatible with the compositional form
  * `array_min(transform(sh, s => xxhash64(s, lit(j))))` (asserted by
  * spec), but one codegen'd loop with a single byte-hash per shingle +
  * k integer mixes, instead of k interpreted HOF passes re-hashing the
  * bytes per slot (higher-order functions are never codegen'd).
  * Empty/null array -> null.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects (array<string>, k>0), got ${dt.catalogString}, k=$k")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val base = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < k) {
        val h = XXH64.hashInt(j, base)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val base = ctx.freshName("base")
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
        |final int $n = $x.numElements();
        |if ($n == 0) { ${ev.isNull} = true; } else {
        |  final long[] $mins = new long[$k];
        |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
        |  for (int $i = 0; $i < $n; $i++) {
        |    final $utf8 $s = $x.getUTF8String($i);
        |    final long $base = $xxh.hashUnsafeBytes(
        |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
        |    for (int $j = 0; $j < $k; $j++) {
        |      final long $h = $xxh.hashInt($j, $base);
        |      if ($h < $mins[$j]) $mins[$j] = $h;
        |    }
        |  }
        |  ${ev.value} = new $gad($mins);
        |}
      """.stripMargin
    })

  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def minhashSig(shingles: Column, k: Int): Column =
    Bridge.toColumn(MinHashSig(Bridge.toExpression(shingles), k))
}
