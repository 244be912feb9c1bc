package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing assignment for LLM training: place documents into
  * fixed-token-budget context windows ("packs") so short documents
  * share a window instead of wasting pad tokens. The assignment is the
  * contiguous-fill rule: walk the docs in a deterministic order,
  * accumulate token counts, and a doc's pack is
  * `floor(cum_tokens_before_it / budget)` — a doc that straddles a
  * boundary belongs to the pack it starts in (trainers truncate or
  * wrap the tail; the assignment stays a pure function of the order).
  *
  * Scale design: a single global running sum is one sequential window
  * — fine for a corpus slice, wrong for 100 TB. `shardCol` splits the
  * corpus into independent packing domains (e.g. a deterministic hash
  * bucket of the doc id — [[graft.operators.Relational.withHashSplit]]):
  * each shard packs in parallel under its own window partition, packs
  * are identified by (shard, pack_id), and the only cross-shard waste
  * is one partial pack per shard — negligible at any real shard size.
  */
object Packing {

  /** Adds `pack_id` (and keeps `shardCol` if given). `order` breaks
    * the walk order inside a shard — include a unique key for a
    * deterministic assignment. */
  def contiguousPacks(df: DataFrame, nTokensCol: String, budget: Long,
      order: Seq[Column], shardCol: Option[String] = None): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = shardCol match {
      case Some(s) => Window.partitionBy(col(s)).orderBy(order: _*)
      case None    => Window.partitionBy().orderBy(order: _*)
    }
    val cumBefore = coalesce(
      sum(col(nTokensCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    df.withColumn("pack_id", floor(cumBefore / lit(budget)))
  }
}
