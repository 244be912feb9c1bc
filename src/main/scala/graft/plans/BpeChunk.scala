package graft.plans

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Chunked-blob kernels for vocabulary-scale BPE training
  * ([[graft.llm.Bpe]]). The word table is packed into ~1k-word CHUNKS
  * (one text blob per chunk: each word's symbol sequence space-joined
  * and space-delimited — `" s1 s2 ... sk "` — words separated by
  * `\n`; a parallel `freqs` array carries word frequencies by line).
  * Per-merge work then scans ~2k chunk rows instead of 2M word rows:
  * the r6 trainer's measured floor was ~1.5 s/merge of pure
  * per-row overhead (deserialize + predicate over 2M rows — the same
  * wall whether the filter built `array_join` per row or read a
  * precomputed joined column), which chunking removes by construction.
  *
  * Byte-level matching is safe: symbols come from whitespace-split
  * tokens (no ' ' or '\n' in any symbol, enforced upstream), and
  * UTF-8 multi-byte sequences never contain the 0x20/0x0A bytes, so a
  * byte search for `" a b "` matches exactly symbol-boundary-aligned
  * occurrences within one word's line.
  *
  * All kernels share [[BpeChunkUtil]] statics so the interpreted and
  * codegen paths run the same bytes (the [[BestFitUtil]] /
  * [[WinnowUtil]] pattern).
  */
object BpeChunkUtil {

  /** Leftmost occurrence of `pat` starting in `bytes[from, end)`, or
    * -1. Plain byte scan — patterns are short and start with 0x20. */
  private def indexOf(bytes: Array[Byte], pat: Array[Byte], from: Int,
      end: Int): Int = {
    val n = math.min(end, bytes.length) - pat.length
    var i = math.max(0, from)
    while (i <= n) {
      if (bytes(i) == pat(0)) {
        var j = 1
        while (j < pat.length && bytes(i + j) == pat(j)) j += 1
        if (j == pat.length) return i
      }
      i += 1
    }
    -1
  }

  /** Greedy left-to-right merge of pair (a,b) in every line of the
    * blob — byte-exact equivalent of [[graft.llm.Bpe.mergePair]]'s
    * fold applied per word. `pat` = `" a b "`, `rep` = `" ab"` (NO
    * trailing space): after a replacement the scan resumes AT the
    * match's trailing space, so that space serves as the leading
    * delimiter of a following overlapped occurrence (`a a a a` merges
    * to `aa aa`, not `aa a a` — the delimiter-sharing case where
    * String.replace diverges from greedy BPE). Returns the input
    * object unchanged when the pair does not occur (no allocation on
    * the untouched-chunk path). */
  def merge(blob: UTF8String, pat: Array[Byte], rep: Array[Byte]): UTF8String = {
    val bytes = blob.getBytes
    var m = indexOf(bytes, pat, 0, bytes.length)
    if (m < 0) return blob
    val out = new Array[Byte](bytes.length)
    var o = 0
    var pos = 0
    while (m >= 0) {
      System.arraycopy(bytes, pos, out, o, m - pos)
      o += m - pos
      System.arraycopy(rep, 0, out, o, rep.length)
      o += rep.length
      pos = m + pat.length - 1 // resume at the trailing delimiter
      m = indexOf(bytes, pat, pos, bytes.length)
    }
    System.arraycopy(bytes, pos, out, o, bytes.length - pos)
    o += bytes.length - pos
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  /** Symbols of one line (bounds exclude nothing — the line carries
    * leading/trailing spaces; empties are skipped). */
  private def lineSymbols(bytes: Array[Byte], start: Int, end: Int): Array[String] = {
    val s = new String(bytes, start, end - start, UTF_8)
    val out = new scala.collection.mutable.ArrayBuffer[String](16)
    var i = 0
    while (i < s.length) {
      while (i < s.length && s.charAt(i) == ' ') i += 1
      val b = i
      while (i < s.length && s.charAt(i) != ' ') i += 1
      if (i > b) out += s.substring(b, i)
    }
    out.toArray
  }

  /** Greedy left-to-right pair merge on a symbol array — the scalar
    * twin of [[graft.llm.Bpe.mergePair]]'s fold. */
  def greedyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  private def addPairs(acc: java.util.HashMap[String, Long],
      syms: Array[String], w: Long): Unit = {
    var i = 0
    while (i + 1 < syms.length) {
      // symbols contain no spaces, so "left right" is an unambiguous key
      val k = syms(i) + " " + syms(i + 1)
      val prev = acc.get(k)
      acc.put(k, (if (prev == null) 0L else prev.longValue()) + w)
      i += 1
    }
  }

  private def toRows(acc: java.util.HashMap[String, Long]): GenericArrayData = {
    val out = new Array[Any](acc.size)
    var n = 0
    val it = acc.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue != 0L) {
        val sp = e.getKey.indexOf(' ')
        out(n) = new GenericInternalRow(Array[Any](
          UTF8String.fromString(e.getKey.substring(0, sp)),
          UTF8String.fromString(e.getKey.substring(sp + 1)),
          e.getValue))
        n += 1
      }
    }
    new GenericArrayData(
      java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], n))
  }

  /** Per-chunk pair-count DELTA of merging (a,b): for each line
    * containing the pair, its old adjacent-pair counts weighted -freq
    * and its post-merge counts weighted +freq, pre-aggregated within
    * the chunk (rows emitted per merge ≈ distinct pairs around the
    * merge sites, not affected-word volume). Untouched lines cost one
    * byte-scan miss. */
  def pairDelta(blob: UTF8String, freqs: ArrayData, pat: Array[Byte],
      a: String, b: String): GenericArrayData = {
    val bytes = blob.getBytes
    val acc = new java.util.HashMap[String, Long]()
    var line = 0
    var start = 0
    while (start < bytes.length) {
      var nl = start
      while (nl < bytes.length && bytes(nl) != '\n') nl += 1
      if (line >= freqs.numElements())
        throw new IllegalStateException(
          s"chunk blob has more lines than freqs (${freqs.numElements()})")
      if (indexOf(bytes, pat, start, nl) >= 0) {
        val f = freqs.getLong(line)
        val syms = lineSymbols(bytes, start, nl)
        addPairs(acc, syms, -f)
        addPairs(acc, greedyMerge(syms, a, b), f)
      }
      start = nl + 1
      line += 1
    }
    toRows(acc)
  }

  /** Per-chunk adjacent-pair counts over ALL lines (the initial
    * pair-statistics build — one blob pass instead of the 60M-row
    * positions-explode + shuffle of the DataFrame form). */
  def pairCounts(blob: UTF8String, freqs: ArrayData): GenericArrayData = {
    val bytes = blob.getBytes
    val acc = new java.util.HashMap[String, Long]()
    var line = 0
    var start = 0
    while (start < bytes.length) {
      var nl = start
      while (nl < bytes.length && bytes(nl) != '\n') nl += 1
      if (line >= freqs.numElements())
        throw new IllegalStateException(
          s"chunk blob has more lines than freqs (${freqs.numElements()})")
      addPairs(acc, lineSymbols(bytes, start, nl), freqs.getLong(line))
      start = nl + 1
      line += 1
    }
    toRows(acc)
  }

  val pairRowType: DataType = ArrayType(StructType(Seq(
    StructField("left", StringType, nullable = false),
    StructField("right", StringType, nullable = false),
    StructField("delta", LongType, nullable = false))), containsNull = false)

  private[plans] def checkPair(a: String, b: String): TypeCheckResult =
    if (a.isEmpty || b.isEmpty || (a + b).exists(c => c == ' ' || c == '\n'))
      TypeCheckResult.TypeCheckFailure(
        "bpe pair symbols must be non-empty and whitespace-free")
    else TypeCheckResult.TypeCheckSuccess
}

/** bpe_merge_chunk(blob): the blob with pair (a,b) greedily merged in
  * every line. Null blob -> null. */
case class BpeMergeChunk(child: Expression, a: String, b: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => BpeChunkUtil.checkPair(a, b)
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge_chunk expects a string blob, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType

  @transient private lazy val pat = (" " + a + " " + b + " ").getBytes(UTF_8)
  @transient private lazy val rep = (" " + a + b).getBytes(UTF_8)

  override def nullSafeEval(input: Any): Any =
    BpeChunkUtil.merge(input.asInstanceOf[UTF8String], pat, rep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val util = BpeChunkUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val patRef = ctx.addReferenceObj("bpePat", pat, "byte[]")
      val repRef = ctx.addReferenceObj("bpeRep", rep, "byte[]")
      s"${ev.value} = $util.merge($x, $patRef, $repRef);"
    })

  override def prettyName: String = "bpe_merge_chunk"
  override protected def withNewChildInternal(newChild: Expression): BpeMergeChunk =
    copy(child = newChild)
}

/** bpe_chunk_pair_delta(blob, freqs): chunk-local (left, right, delta)
  * pair-count changes from merging (a,b). */
case class BpeChunkPairDelta(left: Expression, right: Expression,
    a: String, b: String) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType, _)) => BpeChunkUtil.checkPair(a, b)
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_chunk_pair_delta expects (string, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BpeChunkUtil.pairRowType

  @transient private lazy val pat = (" " + a + " " + b + " ").getBytes(UTF_8)

  override def nullSafeEval(blob: Any, freqs: Any): Any =
    BpeChunkUtil.pairDelta(blob.asInstanceOf[UTF8String],
      freqs.asInstanceOf[ArrayData], pat, a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val util = BpeChunkUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val patRef = ctx.addReferenceObj("bpePat", pat, "byte[]")
      val aRef = ctx.addReferenceObj("bpeA", a, "java.lang.String")
      val bRef = ctx.addReferenceObj("bpeB", b, "java.lang.String")
      s"${ev.value} = $util.pairDelta($x, $y, $patRef, $aRef, $bRef);"
    })

  override def prettyName: String = "bpe_chunk_pair_delta"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BpeChunkPairDelta =
    copy(left = newLeft, right = newRight)
}

/** bpe_chunk_pairs(blob, freqs): chunk-local (left, right, count) over
  * all adjacent symbol pairs. */
case class BpeChunkPairs(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_chunk_pairs expects (string, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BpeChunkUtil.pairRowType

  override def nullSafeEval(blob: Any, freqs: Any): Any =
    BpeChunkUtil.pairCounts(blob.asInstanceOf[UTF8String],
      freqs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val util = BpeChunkUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $util.pairCounts($x, $y);"
    })

  override def prettyName: String = "bpe_chunk_pairs"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BpeChunkPairs =
    copy(left = newLeft, right = newRight)
}

/** Compiled form of a whole BPE merge list, applied to one symbol
  * array in a single kernel pass — the encode-side twin of the chunked
  * trainer. The r6 `applyMerges` stacked one interpreted fold layer
  * per merge (localCheckpointing every 64 to bound Catalyst depth): at
  * a 10k-merge production vocabulary that is ~156 full word-table
  * materializations just to SEGMENT. This class applies the merges
  * sequentially in rank order per word (exactly the fold semantics:
  * greedy left-to-right per merge, spec-enforced equal), with symbols
  * int-interned once at plan time so the inner loop is integer
  * compares, and a per-thread epoch-stamped presence table so merges
  * whose pair symbols don't BOTH occur in the word cost O(1) — the
  * common case, since a word holds <=len distinct symbols out of
  * ~2 x numMerges. Worst-case per word is O(numMerges x len); typical
  * is O(numMerges + touched x len). */
final class BpeMergeProgram(merges: Seq[(String, String)]) extends Serializable {
  // intern every symbol a merge can consume or produce
  private val ids = new java.util.HashMap[String, Integer]()
  private def intern(s: String): Int = {
    val got = ids.get(s)
    if (got != null) got.intValue()
    else { val id = ids.size(); ids.put(s, id); id }
  }
  private val aIds = new Array[Int](merges.size)
  private val bIds = new Array[Int](merges.size)
  private val mIds = new Array[Int](merges.size)
  private val mToks = new Array[UTF8String](merges.size)
  merges.zipWithIndex.foreach { case ((a, b), k) =>
    aIds(k) = intern(a); bIds(k) = intern(b); mIds(k) = intern(a + b)
    mToks(k) = UTF8String.fromString(a + b)
  }
  private val nIds = ids.size()

  // per-thread scratch: presence stamps + token/id work arrays
  @transient private lazy val scratch =
    ThreadLocal.withInitial[BpeMergeProgram.Scratch](() =>
      new BpeMergeProgram.Scratch(nIds))

  def apply(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val s = scratch.get()
    s.ensure(n)
    s.nextRow()
    val toks = s.toks
    val symIds = s.ids
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      toks(i) = u
      val id =
        if (u == null) -1
        else { val g = ids.get(u.toString); if (g == null) -1 else g.intValue() }
      symIds(i) = id
      s.mark(id)
      i += 1
    }
    var len = n
    var k = 0
    while (k < aIds.length) {
      if (s.has(aIds(k)) && s.has(bIds(k))) {
        // greedy left-to-right merge in place (the mergePair fold)
        val a = aIds(k); val b = bIds(k)
        var r = 0 // read
        var w = 0 // write
        while (r < len) {
          if (r + 1 < len && symIds(r) == a && symIds(r + 1) == b) {
            symIds(w) = mIds(k); toks(w) = mToks(k)
            s.mark(mIds(k))
            r += 2
          } else {
            symIds(w) = symIds(r); toks(w) = toks(r)
            r += 1
          }
          w += 1
        }
        len = w
      }
      k += 1
    }
    val out = new Array[Any](len)
    i = 0
    while (i < len) { out(i) = toks(i); i += 1 }
    new GenericArrayData(out)
  }
}

object BpeMergeProgram {
  /** Presence stamps are epoch-compared, so rows don't pay a clear;
    * stale marks (symbols merged away) only cost a wasted O(len) scan,
    * never a wrong result — greedy merge of an absent pair is a no-op. */
  final class Scratch(nIds: Int) {
    private val stamp = new Array[Int](math.max(1, nIds))
    private var epoch = 0
    var toks = new Array[UTF8String](64)
    var ids = new Array[Int](64)
    def ensure(n: Int): Unit = if (n > toks.length) {
      toks = new Array[UTF8String](Integer.highestOneBit(n) * 2)
      ids = new Array[Int](toks.length)
    }
    def nextRow(): Unit = {
      epoch += 1
      if (epoch == Int.MaxValue) {
        java.util.Arrays.fill(stamp, 0); epoch = 1
      }
    }
    def mark(id: Int): Unit = if (id >= 0) stamp(id) = epoch
    def has(id: Int): Boolean = id >= 0 && stamp(id) == epoch
  }
}

/** bpe_apply_merges(symbols): the symbol array after the whole merge
  * list, rank order, greedy left-to-right each — one pass, no stacked
  * layers. Null array -> null; null elements pass through unmerged. */
case class BpeApplyMerges(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply_merges expects array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = child.dataType

  @transient private lazy val program = new BpeMergeProgram(merges)

  override def nullSafeEval(input: Any): Any =
    program.apply(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val progRef = ctx.addReferenceObj("bpeProgram", program,
        classOf[BpeMergeProgram].getName)
      s"${ev.value} = $progRef.apply($x);"
    })

  override def prettyName: String = "bpe_apply_merges"
  override protected def withNewChildInternal(newChild: Expression): BpeApplyMerges =
    copy(child = newChild)
}

object BpeChunk {
  def mergeChunk(blob: Column, a: String, b: String): Column =
    Bridge.toColumn(BpeMergeChunk(Bridge.toExpression(blob), a, b))
  def pairDelta(blob: Column, freqs: Column, a: String, b: String): Column =
    Bridge.toColumn(BpeChunkPairDelta(
      Bridge.toExpression(blob), Bridge.toExpression(freqs), a, b))
  def pairCounts(blob: Column, freqs: Column): Column =
    Bridge.toColumn(BpeChunkPairs(
      Bridge.toExpression(blob), Bridge.toExpression(freqs)))
  def applyMerges(symbols: Column, merges: Seq[(String, String)]): Column =
    Bridge.toColumn(BpeApplyMerges(Bridge.toExpression(symbols), merges))
}
