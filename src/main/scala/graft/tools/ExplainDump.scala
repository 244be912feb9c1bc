package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a set of queries to files — the
  * optimization round's plan evidence (plans/r14/<q>_<tag>.txt). AQE
  * stays ON (the execution-time default) but the dump records the
  * static plan; exchange counts and join strategies read the same
  * either way at this stage.
  *
  *   sbt -batch "runMain graft.tools.ExplainDump <outDir> <tag> q1,q2,..."
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <tag> <q1,q2,...>")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.debug.maxToStringFields", "250")
      .config("spark.sql.maxMetadataStringLength", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          outDir.resolve(s"${n}_$tag.txt"), txt)
        Predef.println(s"[explain] wrote ${n}_$tag.txt (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          Predef.println(s"[explain] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
