package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** SparkSessionExtensions entry point: registers the graft-native
  * expressions under SQL names so `spark.sql("SELECT cosine_sim(a,b)")`
  * works next to the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => HammingZeroAsEquality)
  }
}

/** Optimizer rule: `hamming64(a, b) = 0` is exactly `a = b` — rewriting
  * it lets Catalyst plan joins on simhash equality as hash/sort-merge
  * EQUI-joins instead of nested-loop joins with an opaque predicate.
  * (popcount(a XOR b) = 0 <=> a XOR b = 0 <=> a = b; null semantics
  * match: either side null makes both forms null.) */
object HammingZeroAsEquality extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case EqualTo(Hamming64(a, b), Literal(0, dt))
          if dt == org.apache.spark.sql.types.IntegerType => EqualTo(a, b)
      case EqualTo(Literal(0, dt), Hamming64(a, b))
          if dt == org.apache.spark.sql.types.IntegerType => EqualTo(a, b)
    }
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(arrayA, arrayB)")
        CosineSimilarity(args(0), args(1))
      }),
    (new FunctionIdentifier("hamming64"),
      new ExpressionInfo(classOf[Hamming64].getName, "hamming64"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hamming64(longA, longB)")
        Hamming64(args(0), args(1))
      }),
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(array<bigint>)")
        SimHash64(args(0))
      }),
    (new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig(array<string>, k)")
        args(1) match {
          case Literal(k: Int, _) => MinHashSig(args(0), k)
          case other => throw new IllegalArgumentException(
            s"minhash_sig k must be an integer literal, got $other")
        }
      }),
    (new FunctionIdentifier("text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "text_stats(text)")
        TextStats(args(0))
      }),
    (new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize(text)")
        NfcNormalize(args(0))
      }),
    (new FunctionIdentifier("accent_fold"),
      new ExpressionInfo(classOf[AccentFold].getName, "accent_fold"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "accent_fold(text)")
        AccentFold(args(0))
      }),
    (new FunctionIdentifier("winnow_fp"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fp"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "winnow_fp(text, k, w)")
        (args(1), args(2)) match {
          case (Literal(k: Int, _), Literal(w: Int, _)) =>
            WinnowFingerprints(args(0), k, w)
          case other => throw new IllegalArgumentException(
            s"winnow_fp k and w must be integer literals, got $other")
        }
      }),
    (new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName,
        "repetition_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "repetition_stats(text)")
        RepetitionStats(args(0))
      }),
    (new FunctionIdentifier("quantize_int8"),
      new ExpressionInfo(classOf[QuantizeInt8].getName, "quantize_int8"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "quantize_int8(array<float|double>)")
        QuantizeInt8(args(0))
      }),
    (new FunctionIdentifier("quantized_cosine"),
      new ExpressionInfo(classOf[QuantizedCosine].getName,
        "quantized_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "quantized_cosine(binary, binary)")
        QuantizedCosine(args(0), args(1))
      }),
    (new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "jaro_winkler(stringA, stringB)")
        JaroWinklerSim(args(0), args(1))
      }),
    (new FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_index"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "hilbert_index(x, y, bits)")
        args(2) match {
          case Literal(b: Int, _) => HilbertIndex(args(0), args(1), b)
          case other => throw new IllegalArgumentException(
            s"hilbert_index bits must be an integer literal, got $other")
        }
      }),
    (new FunctionIdentifier("dtw_dist"),
      new ExpressionInfo(classOf[DtwDistance].getName, "dtw_dist"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "dtw_dist(arrayA, arrayB, band)")
        args(2) match {
          case Literal(b: Int, _) => DtwDistance(args(0), args(1), b)
          case other => throw new IllegalArgumentException(
            s"dtw_dist band must be an integer literal, got $other")
        }
      }))

  /** Runtime registration into a live session (tests, shells):
    * SQL functions via the registry, the optimizer rule via
    * `experimental.extraOptimizations`. */
  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.Bridge.registerFunction(
        spark, id.funcName, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(HammingZeroAsEquality))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ HammingZeroAsEquality
  }
}
