package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Shared winnowing algorithm (static so the codegen path calls the
  * same bytes the interpreted path runs):
  * Rabin-Karp rolling hash over the UTF-8 bytes (true O(1) per-position
  * update) + monotonic-deque sliding-window minimum (O(n) total), then
  * sort+unique. The compositional substr/xxhash64/array_min form does
  * O(k) hashing per position and O(w) min per window, all interpreted —
  * measured ~10 s at sf0.1 vs milliseconds here. */
object WinnowUtil {
  def winnow(bytes: Array[Byte], k: Int, w: Int): Array[Long] = {
    val n = bytes.length - k + 1
    if (n < 1) return Array.emptyLongArray
    val B = 1000003L
    var bk = 1L // B^(k-1)
    var i = 1
    while (i < k) { bk *= B; i += 1 }
    val hashes = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    // finalize mix so adjacent windows decorrelate
    hashes(0) = mix(h)
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xffL) * bk) * B + (bytes(i + k - 1) & 0xffL)
      hashes(i) = mix(h)
      i += 1
    }
    val m = n - w + 1
    if (m < 1) {
      var mn = Long.MaxValue
      i = 0
      while (i < n) { if (hashes(i) < mn) mn = hashes(i); i += 1 }
      return Array(mn)
    }
    // monotonic deque window minimum
    val mins = new Array[Long](m)
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < n) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = hashes(deque(head))
      i += 1
    }
    // distinct via sort + compact
    java.util.Arrays.sort(mins)
    var out = 1
    i = 1
    while (i < m) {
      if (mins(i) != mins(out - 1)) { mins(out) = mins(i); out += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(mins, out)
  }

  private def mix(x: Long): Long = {
    // xorshift-multiply finalizer (splitmix64 tail)
    var z = x
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** winnow_fp(text, k, w): winnowed rolling-hash fingerprint set of a
  * string (see WinnowUtil). Null text -> null; shorter than k -> empty
  * array. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0 && w > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fp expects (string, k>0, w>0), got " +
        s"${child.dataType.catalogString}, k=$k, w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(WinnowUtil.winnow(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes,
      k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val util = WinnowUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad($util.winnow($x.getBytes(), $k, $w));"
    })

  override def prettyName: String = "winnow_fp"
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object Winnow {
  def winnowFp(text: Column, k: Int, w: Int): Column =
    Bridge.toColumn(WinnowFingerprints(Bridge.toExpression(text), k, w))
}
