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

  /** Best-fit-decreasing pack assignment: within every shard, docs are
    * walked in (token count DESC, id) order and each is placed into the
    * FULLEST open pack that still fits it, opening a new pack when none
    * does — the classic bin-packing heuristic (≤ 11/9·OPT + 1), which
    * beats [[contiguousPacks]]' fill-in-order rule on padding waste
    * because small docs backfill the holes big docs leave. Docs larger
    * than the budget get a pack of their own (trainers truncate).
    * Output: (shard, id, n_tokens, pack_id); pack ids are 0-based and
    * shard-local. Deterministic: the walk order is total and best-fit
    * ties resolve to the lowest pack id.
    *
    * Scale design: the packing state (open-pack loads) is inherently
    * sequential, so it lives INSIDE one scalar expression over a
    * per-shard collected array — the native
    * [[graft.plans.BestFitPackIds]] kernel (doGenCode, primitive-array
    * state; it replaced an interpreted `aggregate` HOF whose per-element
    * accumulator rebuild cost a measured 3.4× wall at 10× docs). No
    * UDF, no driver loop; shards pack in parallel. The per-shard
    * collect is the same bounded-domain contract as the shard-window in
    * [[contiguousPacks]]: pick shards (e.g.
    * [[graft.operators.Relational.withHashSplit]] buckets) so a shard's
    * doc LIST fits an executor — thousands to low millions of docs,
    * never the corpus. */
  def bestFitPacks(df: DataFrame, idCol: String, nTokensCol: String,
      budget: Long, shardCol: String): DataFrame = {
    require(budget > 0, "budget must be positive")
    // id keeps its input type (string/UUID ids sort fine in the
    // struct; a numeric cast would silently null them)
    val docs = df.select(col(shardCol).as("shard"),
      struct((-col(nTokensCol).cast("long")).as("negn"),
        col(idCol).as("id")).as("d"))
    val perShard = docs.groupBy("shard")
      .agg(array_sort(collect_list(col("d"))).as("ds"))
    val ps = graft.plans.BestFitPack.bestFitPackIds(
      transform(col("ds"), d => -d.getField("negn")), budget)
    perShard
      .select(col("shard"), col("ds"), ps.as("ps"))
      .select(col("shard"),
        posexplode(arrays_zip(col("ds"), col("ps"))).as(Seq("__i", "z")))
      .select(col("shard"),
        col("z.ds.id").as("id"),
        (-col("z.ds.negn")).as("n_tokens"),
        col("z.ps").cast("long").as("pack_id"))
  }

  /** Chunk long documents into overlapping token windows of
    * `chunkTokens` tokens advancing by `strideTokens` (stride <
    * chunkTokens ⇒ overlap) — the context-length splitting step that
    * precedes packing in a training pipeline. Output: (idCol,
    * chunk_index, chunk_tokens, chunk_text); docs with zero tokens
    * emit no chunks, and no empty tail chunk is emitted (the last
    * chunk starts strictly inside the document).
    *
    * Shape: window START positions are exploded and the chunk string
    * is built after the explode (slice + concat_ws over the staged
    * token array) — the explode-positions rule; see
    * [[graft.llm.Dedup.ngramJaccardPairs]] for the measured pathology
    * of exploding pre-built arrays. Map-only: no shuffle at all —
    * chunking 100 TB is embarrassingly parallel.
    *
    * Unlike the MATCHING operators (shingles/fingerprints), the text
    * here is training payload: whitespace is normalized for stable
    * token windows but case is preserved — case-folding the corpus
    * would silently corrupt what the model trains on. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0,
      "chunk and stride must be positive")
    val toks = df.select(col(idCol),
      split(graft.functions.Text.normWs(col(textCol)), " ").as("__t"))
      .select(col(idCol), col("__t"), size(col("__t")).as("__n"))
    toks
      .filter(col("__n") > 0 && col("__t").getItem(0) =!= "")
      .select(col(idCol), col("__t"), col("__n"),
        posexplode(sequence(lit(1), col("__n"), lit(strideTokens)))
          .as(Seq("chunk_index", "__start")))
      .select(col(idCol), col("chunk_index"),
        least(lit(chunkTokens), col("__n") - col("__start") + 1)
          .cast("int").as("chunk_tokens"),
        concat_ws(" ", slice(col("__t"), col("__start"), lit(chunkTokens)))
          .as("chunk_text"))
  }
}
