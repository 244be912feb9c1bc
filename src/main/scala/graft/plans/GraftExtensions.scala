package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the graft-native
  * expressions under SQL names so `spark.sql("SELECT cosine_sim(a,b)")`
  * works next to the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
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
      }))

  /** Runtime registration into a live session (tests, shells). */
  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.Bridge.registerFunction(
        spark, id.funcName, info, builder)
    }
}
