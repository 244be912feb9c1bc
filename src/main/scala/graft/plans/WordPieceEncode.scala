package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Codegen kernel for WordPiece greedy encoding
  * ([[graft.llm.WordPiece]]): per-word longest-match-first
  * segmentation under plan-embedded vocab sets — the
  * [[UnigramEncodeStats]] pattern (no Dataset encoder boundary on the
  * corpus scan; vocab sets ride the task binary once per stage).
  * Greedy longest-match is WordPiece's DEFINING rule (BERT's
  * tokenizer) and differs from Unigram's Viterbi: greedy commits to
  * the longest prefix even when a shorter first piece would globally
  * segment shorter — both are real tokenizers, spec-contrasted. */
object WordPieceUtil {
  /** Piece count of one word under greedy longest-match-first; -1 when
    * some position has NO matching piece (the whole word becomes one
    * [UNK] token, the BERT convention). `init` holds word-initial
    * pieces, `cont` the "##" continuations (stored WITHOUT the marker).
    *
    * Positions and `maxPieceLen` are CODE POINTS, not UTF-16 units —
    * [[graft.llm.WordPiece.seedVocab]] harvests pieces with Spark's
    * substring/length, which count code points, so the kernel must
    * slice on the same boundaries or supplementary-plane chars (emoji,
    * CJK extensions) would produce half-surrogate pieces the vocab can
    * never contain. */
  def pieces(w: String, init: scala.collection.Set[String],
      cont: scala.collection.Set[String], maxPieceLen: Int): Int = {
    val cpLen = w.codePointCount(0, w.length)
    var posCp = 0
    var posIdx = 0 // UTF-16 index of posCp
    var first = true
    var n = 0
    while (posCp < cpLen) {
      var endCp = math.min(cpLen, posCp + maxPieceLen)
      var found = -1
      while (endCp > posCp && found < 0) {
        val endIdx = w.offsetByCodePoints(posIdx, endCp - posCp)
        val sub = w.substring(posIdx, endIdx)
        if (if (first) init.contains(sub) else cont.contains(sub))
          found = endIdx
        else endCp -= 1
      }
      if (found < 0) return -1
      n += 1
      posCp = endCp
      posIdx = found
      first = false
    }
    n
  }

  def stats(arr: ArrayData, init: scala.collection.Set[String],
      cont: scala.collection.Set[String], maxPieceLen: Int): InternalRow = {
    var nWords = 0L
    var nPieces = 0L
    var nUnk = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        if (w.nonEmpty) {
          nWords += 1L
          val p = pieces(w, init, cont, maxPieceLen)
          if (p < 0) { nUnk += 1L; nPieces += 1L } // one [UNK] token
          else nPieces += p
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nWords, nPieces, nUnk))
  }
}

/** wordpiece_stats(words): struct(n_words, n_pieces, n_unk) from
  * greedy-encoding each word. Null array -> null; null/empty words
  * are skipped. */
case class WordPieceStats(child: Expression,
    init: Set[String], cont: Set[String], maxPieceLen: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if maxPieceLen >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_stats expects (array<string>, maxPieceLen>=1), " +
        s"got ${t.catalogString}, maxPieceLen=$maxPieceLen")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    WordPieceUtil.stats(input.asInstanceOf[ArrayData], init, cont,
      maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val initRef = ctx.addReferenceObj("wpInit", init,
        classOf[Set[String]].getName)
      val contRef = ctx.addReferenceObj("wpCont", cont,
        classOf[Set[String]].getName)
      val util = WordPieceUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" $util.stats($arr, $initRef, $contRef, $maxPieceLen);"
    })

  override def prettyName: String = "wordpiece_stats"
  override protected def withNewChildInternal(
      newChild: Expression): WordPieceStats = copy(child = newChild)
}

object WordPieceStats {
  def wordpieceStats(words: Column, init: Set[String], cont: Set[String],
      maxPieceLen: Int): Column =
    Bridge.toColumn(WordPieceStats(Bridge.toExpression(words), init, cont,
      maxPieceLen))
}
