package graft.llm

import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star training-data-pipeline surface). Baseline = brute-force
  * cosine top-k (exact); scale path = LSH-bucketed search that prunes the
  * candidate set with random-hyperplane buckets before exact scoring.
  */
object Similarity {

  /** Exact top-k cosine neighbors of each query vector among `corpus`
    * (excluding self-matches by id). Query side is broadcast — at scale
    * the query batch is small (a probe set), the corpus is the 100 TB
    * side, so the plan is one corpus scan with a broadcast nested loop,
    * then a per-query top-k via window rank (partial top-k per partition
    * would be the next optimization; rank window on (query × k) rows is
    * already corpus-scan-bound).
    * Output: (query_id, neighbor_id, rank). */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // The inner loop runs |queries| x |corpus| times — it uses the fused
    // native CosineSimilarity kernel (graft.plans): one pass, three
    // accumulators, no per-pair intermediate arrays or lambda calls.
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        graft.plans.VectorExpressions.cosineSim(col("qv"), col("cv")))
    topKPerQuery(scored, k)
  }

  /** Per-query top-k via the bounded-heap aggregator (F2): map-side
    * partial heaps mean the shuffle carries k rows per (partition,
    * query) instead of every scored pair — the window/row_number form
    * shuffles and sorts the full candidate set. Tie-break identical to
    * `orderBy(sim desc, neighbor_id)` (spec-verified). */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.TopKAgg.topK(k, col("sim"), col("neighbor_id"))
        .as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col._2").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"))

  /** Deterministic pseudo-random hyperplanes (no RNG at plan time — a
    * fixed LCG keeps results reproducible across runs/resumes). */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    var s = seed
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next()))
  }

  /** LSH-bucketed ANN: bucket corpus and queries by random-hyperplane
    * signature, join on bucket equality (plus optional multi-probe via
    * fewer bits), exact-score within buckets, top-k per query. Trades
    * recall for a candidate set ~ corpus/2^bits per bucket — the 100 TB
    * path (bucket join instead of full scan per query batch). */
  def lshKnn(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nBits: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val ps = planes(nBits, dim, seed)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Vectors.hyperplaneBucket(col(vecCol), ps).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      Vectors.hyperplaneBucket(col(vecCol), ps).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        graft.plans.VectorExpressions.cosineSim(col("qv"), col("cv")))
    topKPerQuery(scored, k)
  }

  /** kNN label agreement: for each query, how many of its top-k exact
    * neighbors (searched over the full corpus) share its label
    * (embedding-space cluster sanity metric). Output: (query_id, n_agree). */
  def knnLabelAgreement(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val knn = bruteForceKnn(queries, corpus, idCol, vecCol, k)
    val labels = corpus.select(col(idCol), col(labelCol))
    knn
      .join(broadcast(labels.select(col(idCol).as("query_id"),
        col(labelCol).as("q_label"))), "query_id")
      .join(broadcast(labels.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("n_label"))), "neighbor_id")
      .groupBy("query_id")
      .agg(sum(when(col("q_label") === col("n_label"), 1).otherwise(0))
        .cast("long").as("n_agree"))
  }
}
