package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math (SURVEY.md §7.3:
  * custom Catalyst work is reserved for the llm/ extensions; built-ins
  * cover the reference surface).
  *
  * Why an Expression and not `zip_with`+`aggregate`: the higher-order
  * form allocates an intermediate array per row-pair and evaluates a
  * lambda call per element; this kernel is one fused loop over the two
  * float arrays with three accumulators, codegen'd inline into the
  * enclosing WholeStageCodegen stage — measured ~3x faster on the
  * brute-force kNN scan, which is exactly the op whose inner loop runs
  * |corpus| x |queries| times at scale.
  */

/** cosine(a, b) over two array<float>/array<double> columns; null if
  * either side is null, different length, zero-norm, or contains a null
  * element (null propagates, like Spark built-ins; the element null
  * check is only emitted when the input type says containsNull). */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elemsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
    right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = elemIsFloat(left); val yf = elemIsFloat(right)
    val checkNulls = elemsNullable
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val yGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      val hasNullElem = ctx.freshName("hasNullElem")
      val nullCheck =
        if (elemsNullable)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { $hasNullElem = true; break; }"
        else ""
      s"""
        |final int $n = $x.numElements();
        |if ($n != $y.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        |  boolean $hasNullElem = false;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $nullCheck
        |    final double $xi = (double) $x.$xGet($i);
        |    final double $yi = (double) $y.$yGet($i);
        |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        |  }
        |  final double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
        |  if ($hasNullElem || $denom == 0.0) { ${ev.isNull} = true; }
        |  else { ${ev.value} = $dot / $denom; }
        |}
      """.stripMargin
    })
  }

  override def prettyName: String = "cosine_sim"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** hamming64(a, b): population count of (a XOR b) over two longs — the
  * SimHash near-duplicate distance. Codegen is a single Long.bitCount. */
case class Hamming64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming64 expects (bigint, bigint), got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override def prettyName: String = "hamming64"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming64 =
    copy(left = newLeft, right = newRight)
}

/** simhash64(array<long>): 64-bit per-bit-majority signature of a
  * token-hash array. Exists as a native kernel because the
  * aggregate/transform HOF formulation is never codegen'd by Spark
  * (HigherOrderFunction has no doGenCode) — measured ~150x interpreter
  * overhead on the 64-lambda form. Empty/null array -> null. */
case class SimHash64(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) * 2 >= n) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
        |final int $n = $x.numElements();
        |if ($n == 0) { ${ev.isNull} = true; } else {
        |  final int[] $counts = new int[64];
        |  for (int $i = 0; $i < $n; $i++) {
        |    final long $h = $x.getLong($i);
        |    for (int $j = 0; $j < 64; $j++) {
        |      $counts[$j] += (int) (($h >>> $j) & 1L);
        |    }
        |  }
        |  long $sig = 0L;
        |  for (int $j = 0; $j < 64; $j++) {
        |    if ($counts[$j] * 2 >= $n) $sig |= (1L << $j);
        |  }
        |  ${ev.value} = $sig;
        |}
      """.stripMargin
    })

  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** All `planes.length` random-hyperplane sign bits of a vector in ONE
  * fused pass: bit i of the result is set iff dot(v, planes(i)) >= 0.
  * The composed form (`planes.length` separate cosine kernels summed
  * through when()) reads the vector once PER PLANE; this kernel reads
  * it once total — at 12 bits per band that is 12x fewer vector
  * traversals on the banded-LSH hot path.
  *
  * Semantics match the composed cosine form on real inputs: the sign
  * of cosine equals the sign of dot for non-zero vectors, and a
  * zero-norm or wrong-length vector hashes to bucket 0 (the composed
  * form's null-cosine bits collapse to 0 the same way). Null input
  * stays null. */
case class HyperplaneBits(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 63,
    "1..63 planes pack into a signed long")
  require(planes.forall(_.length == planes.head.length),
    "planes must share one dimensionality")
  private def dim: Int = planes.head.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bits expects array<float|double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != dim) return 0L
    val isF = elemIsFloat
    var sumsq = 0.0
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) return 0L
      val x = if (isF) v.getFloat(j).toDouble else v.getDouble(j)
      sumsq += x * x
      j += 1
    }
    if (sumsq == 0.0) return 0L
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      j = 0
      while (j < n) {
        val x = if (isF) v.getFloat(j).toDouble else v.getDouble(j)
        dot += x * plane(j)
        j += 1
      }
      if (dot >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val x = ctx.freshName("x")
      val dot = ctx.freshName("dot")
      val sumsq = ctx.freshName("sumsq")
      val bad = ctx.freshName("bad")
      val plane = ctx.freshName("plane")
      s"""
        |final int $n = $v.numElements();
        |${ev.value} = 0L;
        |boolean $bad = ($n != $dim);
        |double $sumsq = 0.0;
        |if (!$bad) {
        |  for (int $j = 0; $j < $n; $j++) {
        |    if ($v.isNullAt($j)) { $bad = true; break; }
        |    final double $x = (double) $v.$get($j);
        |    $sumsq += $x * $x;
        |  }
        |}
        |if (!$bad && $sumsq != 0.0) {
        |  for (int $p = 0; $p < ${planes.length}; $p++) {
        |    final double[] $plane = $planesRef[$p];
        |    double $dot = 0.0;
        |    for (int $j = 0; $j < $n; $j++) {
        |      $dot += ((double) $v.$get($j)) * $plane[$j];
        |    }
        |    if ($dot >= 0) { ${ev.value} |= (1L << $p); }
        |  }
        |}
      """.stripMargin
    })
  }

  override def prettyName: String = "hyperplane_bits"
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits =
    copy(child = newChild)
}

/** quantize_int8(array<float|double>) -> binary: symmetric per-vector
  * int8 quantization, q[i] = round(127 * x[i] / max|x|). The scale
  * factor is NOT stored because the downstream consumer is cosine
  * similarity, where a positive per-vector scale cancels exactly —
  * the quantized corpus is 4x smaller than float32 (16x vs float64)
  * with no extra metadata column to carry through joins. A zero or
  * null-element vector quantizes to all-zero bytes (QuantizedCosine
  * maps those to null, mirroring cosine_sim's zero-norm rule). */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 expects array<float|double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val isF = elemIsFloat
    val out = new Array[Byte](n)
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return out // all-zero: downstream cosine -> null
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    if (maxAbs == 0.0) return out
    i = 0
    while (i < n) {
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = math.round(127.0 * x / maxAbs).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val a = ctx.freshName("a")
      val maxAbs = ctx.freshName("maxAbs")
      val bad = ctx.freshName("bad")
      val out = ctx.freshName("out")
      s"""
        |final int $n = $v.numElements();
        |final byte[] $out = new byte[$n];
        |double $maxAbs = 0.0;
        |boolean $bad = false;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($v.isNullAt($i)) { $bad = true; break; }
        |  final double $a = java.lang.Math.abs((double) $v.$get($i));
        |  if ($a > $maxAbs) { $maxAbs = $a; }
        |}
        |if (!$bad && $maxAbs != 0.0) {
        |  for (int $i = 0; $i < $n; $i++) {
        |    final double $x = (double) $v.$get($i);
        |    $out[$i] = (byte) java.lang.Math.round(127.0 * $x / $maxAbs);
        |  }
        |}
        |${ev.value} = $out;
      """.stripMargin
    })
  }

  override def prettyName: String = "quantize_int8"
  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

/** quantized_cosine(binary, binary) -> double: cosine over two int8
  * vectors packed as byte arrays. All accumulation is integer (exact —
  * 127^2 * dim stays far inside a long), one fused loop per pair; the
  * pair loop is the ANN hot path, so inputs are 4x smaller than the
  * float32 kernel's, which is the entire point at 100 TB corpus scale:
  * a quantized corpus scan moves a quarter of the bytes per candidate.
  * Null on length mismatch or a zero-norm side (which is also how
  * [[QuantizeInt8]] reports null-element inputs). */
case class QuantizedCosine(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_cosine expects (binary, binary), got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    var dot = 0L; var nx = 0L; var ny = 0L
    var i = 0
    while (i < x.length) {
      val xi = x(i).toLong; val yi = y(i).toLong
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0L || ny == 0L) null
    else dot / (math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        |if ($x.length != $y.length) {
        |  ${ev.isNull} = true;
        |} else {
        |  long $dot = 0L; long $nx = 0L; long $ny = 0L;
        |  for (int $i = 0; $i < $x.length; $i++) {
        |    final long $xi = (long) $x[$i];
        |    final long $yi = (long) $y[$i];
        |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        |  }
        |  if ($nx == 0L || $ny == 0L) { ${ev.isNull} = true; }
        |  else { ${ev.value} =
        |    $dot / (java.lang.Math.sqrt((double) $nx) * java.lang.Math.sqrt((double) $ny)); }
        |}
      """.stripMargin
    })

  override def prettyName: String = "quantized_cosine"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCosine =
    copy(left = newLeft, right = newRight)
}

/** pq_encode(array<float|double>) -> binary: product-quantization
  * code — the vector is split into `m` contiguous subspaces and each
  * subspace is replaced by the index of its nearest codebook centroid
  * (L2). With ksub <= 256 a vector becomes m BYTES (dim-64 float32 ->
  * 8 bytes at m=8: 32x), which is what makes exhaustive ADC scans
  * affordable at corpus scale. The codebook rides as a reference
  * object into codegen (same pattern as HyperplaneBits' planes); the
  * argmin loop is a JVM method on the expression — still inside
  * whole-stage codegen, no interpreted-projection fallback. Inputs
  * are L2-normalized before encoding (cosine semantics); null on
  * null input, length != m * dsub, zero norm, or a null element
  * (mirroring cosine_sim's null rules).
  *
  * With a non-empty `coarse` table (nlist x dim, nlist <= 256) the
  * kernel encodes RESIDUALS — classic IVFADC (round 12): the
  * normalized vector is assigned to its nearest coarse centroid and
  * the codebooks quantize (x - c_cell), whose variance is a fraction
  * of the raw vector's — the precision that lifts recall on
  * isotropic data where raw-vector PQ flat-lines. The cell id is
  * the FIRST code byte, so the binary is (1 + m) bytes and carries
  * everything ADC needs. */
case class PqEncode(child: Expression,
    codebooks: Array[Array[Array[Float]]],
    coarse: Array[Array[Float]] = Array.empty) extends UnaryExpression {

  private val m = codebooks.length
  private val ksub = codebooks(0).length
  private val dsub = codebooks(0)(0).length
  private val nlist = coarse.length
  require(nlist <= 256, s"pq_encode coarse table caps at 256 cells, got $nlist")
  require(coarse.forall(_.length == m * dsub),
    s"pq_encode coarse centroid dim must equal m*dsub=${m * dsub}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Called from both eval and generated code. The vector is
    * L2-NORMALIZED before encoding (cosine semantics — the codebooks
    * are trained on normalized vectors too); zero-norm or
    * null-element inputs return null, mirroring cosine_sim. */
  def encodeArray(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    if (n != m * dsub) return null
    val isF = elemIsFloat
    val x = new Array[Double](n)
    var nrm = 0.0
    var p = 0
    while (p < n) {
      if (v.isNullAt(p)) return null
      val e = if (isF) v.getFloat(p).toDouble else v.getDouble(p)
      x(p) = e
      nrm += e * e
      p += 1
    }
    if (nrm == 0.0 || java.lang.Double.isNaN(nrm)) return null
    val inv = 1.0 / math.sqrt(nrm)
    p = 0
    while (p < n) { x(p) *= inv; p += 1 }
    var cell = -1
    if (nlist > 0) {
      // residual mode: nearest coarse cell of the NORMALIZED vector
      // (strict < argmin — first-index tie-break, deterministic),
      // then subtract its centroid in place
      var bestD = Double.MaxValue
      var c = 0
      while (c < nlist) {
        val cc = coarse(c)
        var d = 0.0
        var t = 0
        while (t < n) { val df = x(t) - cc(t); d += df * df; t += 1 }
        if (d < bestD) { bestD = d; cell = c }
        c += 1
      }
      val cc = coarse(cell)
      var t = 0
      while (t < n) { x(t) -= cc(t); t += 1 }
    }
    val out = new Array[Byte](if (nlist > 0) m + 1 else m)
    val base = if (nlist > 0) { out(0) = cell.toByte; 1 } else 0
    var i = 0
    while (i < m) {
      val cb = codebooks(i)
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        val c = cb(j)
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = x(i * dsub + t) - c(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(base + i) = best.toByte
      i += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    encodeArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        |${ev.value} = $self.encodeArray($v);
        |${ev.isNull} = ${ev.value} == null;
      """.stripMargin
    })
  }

  override def prettyName: String = "pq_encode"
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** pq_lut(array<float|double>) -> array<float>: the asymmetric-
  * distance lookup table for one QUERY vector — entry [i*ksub + j] =
  * dot(q's subspace i, codebook centroid c_ij). One table per query,
  * computed once on the (small, broadcast) query side; corpus rows
  * are then scored by m array lookups each ([[PqAdc]]) instead of
  * dim multiply-adds. Null on null input, length mismatch, zero
  * norm, or a null element.
  *
  * With a non-empty `coarse` table (the [[PqEncode]] residual mode)
  * the first nlist entries are dot(q-normalized, coarse centroid c)
  * — the exact first-order term of q·x = q·c_cell + q·residual; the
  * residual table follows at offset nlist. */
case class PqLut(child: Expression,
    codebooks: Array[Array[Array[Float]]],
    coarse: Array[Array[Float]] = Array.empty) extends UnaryExpression {

  private val m = codebooks.length
  private val ksub = codebooks(0).length
  private val dsub = codebooks(0)(0).length
  private val nlist = coarse.length
  require(coarse.forall(_.length == m * dsub),
    s"pq_lut coarse centroid dim must equal m*dsub=${m * dsub}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pq_lut expects array<float|double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** L2-normalizes the query before building the table (cosine
    * semantics, like [[PqEncode.encodeArray]]); zero-norm or
    * null-element inputs return null. */
  def lutArray(v: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = v.numElements()
    if (n != m * dsub) return null
    val isF = elemIsFloat
    val x = new Array[Double](n)
    var nrm = 0.0
    var p = 0
    while (p < n) {
      if (v.isNullAt(p)) return null
      val e = if (isF) v.getFloat(p).toDouble else v.getDouble(p)
      x(p) = e
      nrm += e * e
      p += 1
    }
    if (nrm == 0.0 || java.lang.Double.isNaN(nrm)) return null
    val inv = 1.0 / math.sqrt(nrm)
    val out = new Array[Float](nlist + m * ksub)
    var c0 = 0
    while (c0 < nlist) {
      val cc = coarse(c0)
      var d = 0.0
      var t = 0
      while (t < n) { d += x(t) * inv * cc(t); t += 1 }
      out(c0) = d.toFloat
      c0 += 1
    }
    var i = 0
    while (i < m) {
      val cb = codebooks(i)
      var j = 0
      while (j < ksub) {
        val c = cb(j)
        var d = 0.0
        var t = 0
        while (t < dsub) {
          d += x(i * dsub + t) * inv * c(t)
          t += 1
        }
        out(nlist + i * ksub + j) = d.toFloat
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    lutArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        |${ev.value} = $self.lutArray($v);
        |${ev.isNull} = ${ev.value} == null;
      """.stripMargin
    })
  }

  override def prettyName: String = "pq_lut"
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** pq_adc(array<float> lut, binary codes, ksub, nlist) -> double:
  * asymmetric distance computation — the approximate dot product of
  * a query (via its LUT) against one PQ-coded corpus vector:
  * sum_i lut[nlist + i*ksub + codes[i]], plus — in residual mode
  * (nlist > 0, the [[PqEncode]] IVFADC layout) — the exact coarse
  * term lut[codes[0]], the cell id being the leading code byte.
  * m (+1) array reads per pair instead of dim multiply-adds, over an
  * ~m-byte code instead of a 256-byte float vector — the inner loop
  * of exhaustive PQ search, codegen'd inline. Null if the LUT length
  * does not equal nlist + (codes.length - base) * ksub. */
case class PqAdc(left: Expression, right: Expression, ksub: Int,
    nlist: Int = 0) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<float>, binary), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private val base = if (nlist > 0) 1 else 0

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[Array[Byte]]
    if (codes.length < base ||
      lut.numElements() != nlist + (codes.length - base) * ksub)
      return null
    var s = 0.0
    if (base == 1) {
      val cell = codes(0) & 0xff
      if (cell >= nlist) return null
      s = lut.getFloat(cell)
    }
    var i = 0
    while (i < codes.length - base) {
      s += lut.getFloat(nlist + i * ksub + (codes(base + i) & 0xff))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val cell = ctx.freshName("cell")
      val bad = ctx.freshName("bad")
      s"""
        |boolean $bad = $codes.length < $base ||
        |  $lut.numElements() != $nlist + ($codes.length - $base) * $ksub;
        |double $s = 0.0;
        |if (!$bad && $base == 1) {
        |  int $cell = $codes[0] & 0xff;
        |  if ($cell >= $nlist) { $bad = true; }
        |  else { $s = $lut.getFloat($cell); }
        |}
        |if ($bad) { ${ev.isNull} = true; }
        |else {
        |  for (int $i = 0; $i < $codes.length - $base; $i++) {
        |    $s += $lut.getFloat($nlist + $i * $ksub + ($codes[$base + $i] & 0xff));
        |  }
        |  ${ev.value} = $s;
        |}
      """.stripMargin
    })

  override def prettyName: String = "pq_adc"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** l2sq_const(vec): squared L2 distance to a CONSTANT centroid,
  * fused into one codegen loop — the assignment kernel of the exact
  * k-means ([[graft.llm.Similarity]]) and the IVF quantizer. The
  * composed `aggregate(zip_with(...))` HOF form computes the same
  * left fold but is never whole-stage-codegen'd: every element pays
  * a lambda dispatch plus boxing, and the k-means argmin evaluates
  * it k times per row — the r11 profile put the 2M×64-dim assignment
  * at 11 s where this loop does it in ~1 s. NULL PARITY with the HOF
  * is exact and load-bearing (q_kmeans is hash-checked): a length
  * mismatch or any null element yields NULL, matching zip_with's
  * null padding folded through `acc + null`. The fold order is the
  * same ascending-index left fold, so sums agree bit for bit. */
case class L2SqConst(child: Expression, cent: Array[Double])
  extends UnaryExpression {
  // an EMPTY centroid is legal (a corpus row with an empty embedding
  // can seed a cluster): the length check below gives d=0.0 against
  // an empty input and NULL against any non-empty one — exactly the
  // HOF's zip_with/aggregate behavior, no construction-time throw

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"l2sq_const expects array<float|double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != cent.length) return null
    val isF = elemIsFloat
    var acc = 0.0
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) return null
      val x = if (isF) v.getFloat(j).toDouble else v.getDouble(j)
      val d = x - cent(j)
      acc += d * d
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val centRef = ctx.addReferenceObj("cent", cent, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
        |final int $n = $v.numElements();
        |${ev.value} = 0.0;
        |if ($n != ${cent.length}) { ${ev.isNull} = true; }
        |else {
        |  double $acc = 0.0;
        |  for (int $j = 0; $j < $n; $j++) {
        |    if ($v.isNullAt($j)) { ${ev.isNull} = true; break; }
        |    final double $d = ((double) $v.$get($j)) - $centRef[$j];
        |    $acc += $d * $d;
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = $acc; }
        |}
      """.stripMargin
    })
  }

  override def prettyName: String = "l2sq_const"
  override protected def withNewChildInternal(newChild: Expression): L2SqConst =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-API entry points (no session registration needed). */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.toColumn(CosineSimilarity(
      Bridge.toExpression(a), Bridge.toExpression(b)))

  def hamming64(a: Column, b: Column): Column =
    Bridge.toColumn(Hamming64(
      Bridge.toExpression(a), Bridge.toExpression(b)))

  def simhash64(tokenHashes: Column): Column =
    Bridge.toColumn(SimHash64(Bridge.toExpression(tokenHashes)))

  def hyperplaneBits(v: Column, planes: Seq[Seq[Double]]): Column =
    Bridge.toColumn(HyperplaneBits(Bridge.toExpression(v),
      planes.map(_.toArray).toArray))

  def quantizeInt8(v: Column): Column =
    Bridge.toColumn(QuantizeInt8(Bridge.toExpression(v)))

  def quantizedCosine(a: Column, b: Column): Column =
    Bridge.toColumn(QuantizedCosine(
      Bridge.toExpression(a), Bridge.toExpression(b)))

  def pqEncode(v: Column, codebooks: Array[Array[Array[Float]]],
      coarse: Array[Array[Float]] = Array.empty): Column =
    Bridge.toColumn(PqEncode(Bridge.toExpression(v), codebooks, coarse))

  def pqLut(v: Column, codebooks: Array[Array[Array[Float]]],
      coarse: Array[Array[Float]] = Array.empty): Column =
    Bridge.toColumn(PqLut(Bridge.toExpression(v), codebooks, coarse))

  def pqAdc(lut: Column, codes: Column, ksub: Int,
      nlist: Int = 0): Column =
    Bridge.toColumn(PqAdc(
      Bridge.toExpression(lut), Bridge.toExpression(codes), ksub, nlist))

  def l2sqConst(v: Column, cent: Array[Double]): Column =
    Bridge.toColumn(L2SqConst(Bridge.toExpression(v), cent))
}
