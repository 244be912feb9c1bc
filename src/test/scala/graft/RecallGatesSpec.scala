package graft

/** Hard quality gates for the approximate-operator families, asserted
  * on the SAME SparkEntry queries the driver grades (sf0.001 ==
  * sf0.01's documents/embeddings tables, so the numbers here are the
  * graded numbers). Fixed seeds + deterministic planes make every
  * metric exact — a refactor that silently degrades recall fails the
  * build here instead of shipping.
  */
class RecallGatesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def row(q: String): org.apache.spark.sql.Row = {
    val r = SparkEntry.queries(q)(spark, sf).collect()
    graft.llm.Dedup.releaseCaches()
    // gate queries filter on their own `pass` column — an empty result
    // means the metric fell below the floor stamped in the query
    assert(r.length == 1,
      s"$q must emit a one-row summary (0 rows = the in-query gate failed)")
    r.head
  }

  test("multi-table LSH kNN recall@5 stays above the floor") {
    val r = row("q_lsh_knn_recall")
    assert(r.getAs[Long]("n_exact") == 50L)
    assert(r.getAs[Double]("recall") >= 0.6, s"lshKnn recall degraded: $r")
    // the floor the query itself gates on must be THIS floor — a
    // silently loosened in-query gate fails here
    assert(r.getAs[Double]("min_recall") == 0.6 && r.getAs[Boolean]("pass"))
  }

  test("IVF ANN recall@5 at nProbe=4/nlist=16 stays above the floor") {
    val r = row("q_ivf_knn_recall")
    assert(r.getAs[Long]("n_exact") == 50L)
    assert(r.getAs[Double]("recall") >= 0.5, s"ivfKnn recall degraded: $r")
    assert(r.getAs[Double]("min_recall") == 0.5 && r.getAs[Boolean]("pass"))
  }

  test("int8-quantized kNN recall@5 vs the float kernel stays above the floor") {
    val r = row("q_int8_knn_recall")
    assert(r.getAs[Long]("n_exact") == 50L)
    assert(r.getAs[Double]("recall") >= 0.9, s"int8 kNN recall degraded: $r")
    assert(r.getAs[Double]("min_recall") == 0.9 && r.getAs[Boolean]("pass"))
  }

  test("PQ-ADC kNN recall@5 stays above the LSH/IVF-tier floor") {
    // random gaussian fixtures are PQ's worst case (near-tied
    // neighbors everywhere); m=16 x 256 centroids measured 0.84 here
    // and 0.76 at sf0.01, deterministic under the fixed seed
    val r = row("q_pq_knn_recall")
    assert(r.getAs[Long]("n_exact") == 50L)
    assert(r.getAs[Double]("recall") >= 0.7, s"PQ kNN recall degraded: $r")
    assert(r.getAs[Double]("min_recall") == 0.7 && r.getAs[Boolean]("pass"))
    graft.llm.Similarity.clearPqCache()
  }

  test("composed IVF-PQ recall@5 stays above the stacked-loss floor") {
    val r = row("q_ivfpq_knn_recall")
    assert(r.getAs[Long]("n_exact") == 50L)
    assert(r.getAs[Double]("recall") >= 0.6, s"IVF-PQ recall degraded: $r")
    assert(r.getAs[Double]("min_recall") == 0.6 && r.getAs[Boolean]("pass"))
    graft.llm.Similarity.clearPqCache()
    graft.llm.Similarity.clearIvfCache()
  }

  test("PCA shortlist+rerank recall@5 stays above the floor") {
    val r = row("q_pca_knn_recall")
    assert(r.getAs[Long]("n_exact") == 50L)
    assert(r.getAs[Double]("recall") >= 0.8,
      s"pcaRerankKnn recall degraded: $r")
    assert(r.getAs[Double]("min_recall") == 0.8 && r.getAs[Boolean]("pass"))
  }

  test("pcaReduce at full rank is an orthogonal rotation: kNN rankings survive") {
    import org.apache.spark.sql.functions._
    import graft.llm.{Similarity, Recall}
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val red = Similarity.pcaReduce(emb, "vec_id", "embedding", 64)
    // reduced vectors have the requested width
    assert(red.select(size(col("embedding"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(64))
    val q = emb.filter(col("vec_id") < 10)
    val qr = red.filter(col("vec_id") < 10)
    val r = Recall.knnRecall(
      Similarity.bruteForceKnn(qr, red, "vec_id", "embedding", 5),
      Similarity.bruteForceKnn(q, emb, "vec_id", "embedding", 5))
      .collect().head
    // cosine is invariant under the full-rank rotation (float32
    // round-trip can only reorder exact ties)
    assert(r.getAs[Double]("recall") >= 0.98, s"rotation broke rankings: $r")
  }

  test("HLL inclusion-exclusion overlap stays within its in-row error gate") {
    val r = row("q_overlap_gate")
    assert(r.getAs[Boolean]("pass"))
    assert(r.getAs[Double]("rel_err") <= 0.15)
    assert(r.getAs[Long]("n_exact") > 0)
  }

  test("frequent-items sketch never misses a true heavy hitter") {
    val r = row("q_freq_tokens_gate")
    assert(r.getAs[Long]("n_exact") > 0L, s"empty ground truth: $r")
    assert(r.getAs[Double]("recall") == 1.0,
      s"Misra-Gries superset guarantee broken: $r")
    assert(r.getAs[Double]("min_recall") == 1.0 && r.getAs[Boolean]("pass"))
  }

  test("minhash cluster pairs track exact jaccard>=0.7 pairs") {
    val r = row("q_minhash_pair_quality")
    assert(r.getAs[Double]("precision") >= 0.95,
      s"minhash cluster precision degraded: $r")
    assert(r.getAs[Double]("recall") >= 0.95,
      s"minhash cluster recall degraded: $r")
    assert(r.getAs[Double]("min_precision") == 0.95 &&
      r.getAs[Double]("min_recall") == 0.95 && r.getAs[Boolean]("pass"))
  }

  test("simhash pigeonhole banding is EXACT (precision = recall = 1)") {
    // mathematical guarantee: any pair within hamming d agrees on one
    // of d+1 blocks, and candidates are verified with exact hamming —
    // anything else is a banding bug, so the gate is equality
    val r = row("q_simhash_band_recall")
    assert(r.getAs[Double]("precision") == 1.0, s"banding broke: $r")
    assert(r.getAs[Double]("recall") == 1.0, s"banding broke: $r")
    assert(r.getAs[Double]("min_precision") == 1.0 &&
      r.getAs[Double]("min_recall") == 1.0 && r.getAs[Boolean]("pass"))
  }

  test("knnRecall is duplicate-proof: repeated approx pairs can't inflate it") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 10L))
      .toDF("query_id", "neighbor_id")
    // one true hit repeated 5x (raw band-join output shape) + one miss
    val approx = (Seq.fill(5)((1L, 10L)) :+ (2L, 99L))
      .toDF("query_id", "neighbor_id")
    val r = graft.llm.Recall.knnRecall(approx, exact).head()
    assert(r.getAs[Long]("n_exact") == 3L, r.toString)
    assert(r.getAs[Long]("n_hit") == 1L, r.toString)
    assert(math.abs(r.getAs[Double]("recall") - 1.0 / 3) < 1e-6, r.toString)
  }

  test("HLL++ distinct estimate carries its own error gate in-row") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, sf).collect()
    val nTypes = SparkEntry.queries("q_count_distinct")(spark, sf).count()
    // every group must SURVIVE the in-row rel_err <= 0.05 filter — a
    // drifting sketch shows up as dropped rows, exactly what the
    // driver's rows check pins
    assert(rows.length.toLong == nTypes,
      s"HLL++ gate dropped groups: ${rows.length} of $nTypes")
    rows.foreach { r =>
      assert(r.getAs[Double]("rel_err") <= 0.05 &&
        r.getAs[Double]("max_rel_err") == 0.05 && r.getAs[Boolean]("pass"),
        s"gate row inconsistent: $r")
      assert(r.getAs[Long]("n_users_exact") > 0L, r.toString)
    }
  }

  test("chunked-vs-recount BPE trainer gate emits its passing row") {
    val rows = SparkEntry.queries("q_bpe_train_gate")(spark, sf).collect()
    graft.llm.Bpe.releaseCaches()
    assert(rows.length == 1, s"trainer gate dropped its row: ${rows.toSeq}")
    val r = rows.head
    assert(r.getAs[Boolean]("sequences_equal") && r.getAs[Boolean]("pass") &&
      r.getAs[Long]("n_merges_incremental") ==
        r.getAs[Long]("n_merges_recount"), r.toString)
  }

  test("approx_percentile rank error stays within the documented bound") {
    val rows = SparkEntry.queries("q_approx_percentiles")(spark, sf).collect()
    // 3 return flags x 4 percentiles; the in-row gate filters on the
    // sketch's own guarantee (rank error <= N/accuracy), so any
    // degraded cell DROPS its row
    assert(rows.length == 12, s"rank-error gate dropped rows: ${rows.length}")
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val p = r.getAs[Double]("p")
      val err = r.getAs[Double]("max_rank_err")
      assert(r.getAs[Long]("rank_lt") - err <= p * n &&
        p * n <= r.getAs[Long]("rank_le") + err && r.getAs[Boolean]("pass"),
        s"rank bound violated: $r")
    }
  }

  test("banded hyperplane LSH near-dup recall at the graded threshold") {
    val r = row("q_embedding_band_recall")
    // exact-cosine verify step makes precision exact by construction
    assert(r.getAs[Double]("precision") == 1.0, s"verify step broke: $r")
    assert(r.getAs[Double]("recall") >= 0.85,
      s"banded embedding recall degraded: $r")
    assert(r.getAs[Double]("min_precision") == 1.0 &&
      r.getAs[Double]("min_recall") == 0.85 && r.getAs[Boolean]("pass"))
  }

  test("LSH-edge leakage split: exact near-dups never straddle buckets") {
    val r = row("q_leakage_gate")
    assert(r.getAs[Long]("n_pairs") > 0L, s"empty ground truth: $r")
    assert(r.getAs[Long]("n_straddle") == 0L, s"split leaked: $r")
    assert(r.getAs[Double]("straddle_rate") == 0.0, s"split leaked: $r")
    assert(r.getAs[Boolean]("pass"), s"gate column disagrees: $r")
  }
}
