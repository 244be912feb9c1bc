package graft

import graft.streaming.Stateful
import graft.streaming.Stateful.{EwmaOut, PricePoint}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("ewmaPerSymbol carries state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PricePoint]
    val q = Stateful.ewmaPerSymbol(mem.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("ewma_t")
      .outputMode("append").start()
    try {
      mem.addData(PricePoint("XOM", 1L, 100.0), PricePoint("XOM", 2L, 110.0))
      q.processAllAvailable()
      mem.addData(PricePoint("XOM", 3L, 120.0), PricePoint("BP", 1L, 30.0))
      q.processAllAvailable()
      val out = spark.table("ewma_t").as[EwmaOut]
        .collect().sortBy(o => (o.symbol, o.timestamp))
      val xom = out.filter(_.symbol == "XOM").map(_.ewma)
      // 100 -> .5*110+.5*100=105 -> .5*120+.5*105=112.5 (state crossed batches)
      assert(xom.toSeq == Seq(100.0, 105.0, 112.5))
      assert(out.filter(_.symbol == "BP").map(_.ewma).toSeq == Seq(30.0))
      assert(out.filter(_.symbol == "XOM").map(_.n).toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
