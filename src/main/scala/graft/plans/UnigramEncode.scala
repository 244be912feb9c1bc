package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Codegen kernel for the unigram-LM encode pass
  * ([[graft.llm.Unigram.encodeDocs]]): per-row Viterbi DP over the
  * word array under a plan-embedded vocabulary map — the
  * [[RepetitionStats]] pattern. Replaces the one remaining typed
  * `.map` on a text hot path: the Dataset encoder round-trip
  * (UTF8String array -> Scala Seq -> tuple encoder) is gone; the
  * kernel reads ArrayData in place and emits a 3-field struct. The
  * vocab map rides the expression as a reference object — Spark
  * broadcasts the task binary per stage, so executors receive one
  * copy, same effective cost as the explicit Broadcast the typed path
  * used. Equality with the typed path is spec-enforced (UnigramSpec).
  */
object UnigramEncodeUtil {
  def stats(arr: ArrayData, logp: scala.collection.Map[String, Double],
      maxPieceLen: Int): InternalRow = {
    var nWords = 0L
    var nPieces = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        if (w.nonEmpty) {
          nWords += 1L
          nPieces += graft.llm.Unigram.viterbi(w, logp, maxPieceLen).length
        }
      }
      i += 1
    }
    val fert =
      if (nWords == 0L) 0.0
      else math.rint(nPieces.toDouble / nWords * 1e6) / 1e6
    new GenericInternalRow(Array[Any](nWords, nPieces, fert))
  }
}

/** unigram_encode_stats(words): struct(n_words, n_pieces, fertility)
  * from Viterbi-segmenting each word under the vocabulary. Null array
  * -> null; null/empty words are skipped (the typed path's filter). */
case class UnigramEncodeStats(child: Expression,
    logp: Map[String, Double], maxPieceLen: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if maxPieceLen >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode_stats expects (array<string>, maxPieceLen>=1), " +
        s"got ${t.catalogString}, maxPieceLen=$maxPieceLen")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("fertility", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    UnigramEncodeUtil.stats(input.asInstanceOf[ArrayData], logp, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val util = UnigramEncodeUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val mapRef = ctx.addReferenceObj("unigramLogp", logp,
        "scala.collection.Map")
      s"${ev.value} = (InternalRow) $util.stats($x, $mapRef, $maxPieceLen);"
    })

  override def prettyName: String = "unigram_encode_stats"
  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeStats =
    copy(child = newChild)
}

object UnigramEncode {
  def stats(words: Column, logp: Map[String, Double],
      maxPieceLen: Int): Column =
    Bridge.toColumn(UnigramEncodeStats(
      Bridge.toExpression(words), logp, maxPieceLen))
}
