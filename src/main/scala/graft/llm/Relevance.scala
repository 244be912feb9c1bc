package graft.llm

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term-relevance scoring over a document corpus (north-star
  * text-analysis surface): TF-IDF keyword extraction and BM25 ranked
  * retrieval — the lexical-relevance half of a training-data pipeline
  * (keyword profiling, query-based corpus slicing, hard-negative
  * mining for retrieval training).
  *
  * Scale shape: everything is one token explode + hash aggregates
  * keyed by (doc id | term) — the same shuffle profile as
  * [[LanguageModel]]; corpus-level scalars (N, avgdl) ride along as
  * broadcast single-row frames, never a driver collect.
  */
object Relevance {

  /** (id, w) token rows, lower-cased, empty pseudo-token dropped. */
  private def tokenRows(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol).as("id"),
        explode(Text.tokens(lower(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)

  /** Top-k terms per document by smoothed TF-IDF
    * (sklearn-style: tfidf = tf * (ln((N+1)/(df+1)) + 1), where df is
    * the number of documents containing the term). Ranking is on the
    * ROUNDED score (then term asc) so the k-set is reproducible
    * bit-for-bit across engines — raw FP products can differ in the
    * last ulp between ln implementations.
    * Output: (idCol, term, tfidf, rank). */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int, scale: Int = 6): DataFrame = {
    val tf = tokenRows(df, idCol, textCol)
      .groupBy("id", "w").agg(count(lit(1)).as("tf"))
    // tf rows are distinct (id, w): counting them per term IS the
    // document frequency — no second distinct pass over raw tokens
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val n = tf.select(col("id")).distinct().agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "w")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") *
        (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1), scale))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("w"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id").as(idCol), col("w").as("term"),
        col("tfidf"), col("rank"))
  }

  /** Distinctive vocabulary per corpus slice — class-based TF-IDF
    * (the BERTopic c-TF-IDF shape, Grootendorst 2022): each class is
    * treated as ONE concatenated document, and a term's score in a
    * class is tf_{w,c} · ln(1 + A / f_w), with A the mean tokens per
    * class and f_w the term's corpus-wide count. The "what makes this
    * source/cluster different" labeler that plain per-doc TF-IDF
    * can't answer.
    *
    * Scale shape: one token explode → ONE map-side-combined
    * (class, term) count; the term-total and class-size frames both
    * aggregate off that count frame (term- and class-cardinality
    * sized), and the top-k rides a per-class window over the count
    * frame. Ranking is on the ROUNDED score (then term asc) — the
    * [[tfidfTopTerms]] reproducibility discipline, since ln
    * implementations may differ in the last ulp.
    * Output: (classCol, term, ctfidf, rank). */
  def distinctiveTerms(df: DataFrame, classCol: String, textCol: String,
      k: Int, scale: Int = 6): DataFrame = {
    val ctf = df.select(col(classCol).as("__c"),
        explode(Text.tokens(lower(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("__c"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val fw = ctf.groupBy("w").agg(sum(col("tf")).as("__fw"))
    val a = ctf.agg((sum(col("tf")).cast("double") /
      countDistinct(col("__c"))).as("__A"))
    val w = Window.partitionBy(col("__c"))
      .orderBy(col("ctfidf").desc, col("w"))
    ctf.join(fw, "w")
      .crossJoin(broadcast(a))
      .withColumn("ctfidf",
        round(col("tf") * log(lit(1.0) + col("__A") / col("__fw")), scale))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__c").as(classCol), col("w").as("term"),
        col("ctfidf"), col("rank"))
  }

  /** BM25 relevance of every matching document for a bag-of-terms
    * query (Robertson/Lucene formulation):
    *
    *   score = Σ_t idf(t) * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
    *
    * Documents sharing no query term are absent (score 0). Term
    * statistics (df, dl, avgdl, N) are fitted on the full corpus;
    * only tf rows matching the query terms flow past the first
    * filter, so the per-query cost is a filtered aggregate — the
    * inverted-index access pattern, expressed relationally.
    * Output: (idCol, score) rounded to `scale`. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      scale: Int = 6): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = tokenRows(df, idCol, textCol)
    // per-doc length over ALL tokens (BM25 normalizes by full doc
    // length, not just matching terms); avgdl/N ride as a broadcast
    val dl = toks.groupBy("id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(avg(col("dl")).as("avgdl"),
      count(lit(1)).cast("double").as("n_docs"))
    val terms = queryTerms.map(_.toLowerCase).distinct
    val tf = toks.filter(col("w").isin(terms: _*))
      .groupBy("id", "w").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "w")
      .join(dl, "id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("part",
        col("idf") * col("tf") * (lit(k1) + 1) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("id").as(idCol))
      .agg(round(sum(col("part")), scale).as("score"))
  }

  /** Minimum token distance between two terms per document — the
    * proximity signal BM25 lacks (bag-of-words scores "new york" the
    * same whether the words are adjacent or paragraphs apart). Only
    * docs containing BOTH terms appear. Output: (idCol, min_distance).
    *
    * Shape: occurrences of either term are a per-doc sorted stream;
    * the global minimum cross-term distance is always realized by two
    * ADJACENT occurrences with different tags (two-pointer argument),
    * so one id-partitioned lag window finds it — positions never
    * cross-join, and the window input is occurrence rows of the two
    * terms only, not the corpus token stream. */
  def termProximity(df: DataFrame, idCol: String, textCol: String,
      termA: String, termB: String): DataFrame = {
    require(termA.toLowerCase != termB.toLowerCase,
      "terms must differ (distance 0 is degenerate)")
    val (a, b) = (termA.toLowerCase, termB.toLowerCase)
    val occ = df.select(col(idCol).as("id"),
        posexplode(Text.tokens(lower(col(textCol)))).as(Seq("p", "w")))
      .filter(col("w") === a || col("w") === b)
      .select(col("id"), col("p"), (col("w") === a).as("isA"))
    val w = Window.partitionBy("id").orderBy("p")
    occ
      .withColumn("__pp", lag(col("p"), 1).over(w))
      .withColumn("__pa", lag(col("isA"), 1).over(w))
      .filter(col("__pa").isNotNull && col("__pa") =!= col("isA"))
      .groupBy(col("id").as(idCol))
      .agg(min(col("p") - col("__pp")).cast("long").as("min_distance"))
  }

  /** PMI collocations (Church & Hanks 1990): top-k adjacent-bigram
    * phrases ranked by pointwise mutual information
    * ln(P(ab) / (P(a)·P(b))) with a minimum-count support floor — the
    * phrase miner that frequency ranking (q_top_ngrams) is not: raw
    * counts surface "of the"; PMI surfaces "los angeles" (components
    * rare outside the pair). In a training-data pipeline this is the
    * multi-word-expression vocabulary feed for tokenizer seeding and
    * boilerplate phrase discovery.
    *
    * Scale shape: one unigram and one bigram count pass (both hash
    * aggregates with map-side combine), the bigram frame joined twice
    * to the word-keyed unigram frame (vocab-sized, shuffle join —
    * never broadcast: vocabulary grows with the corpus), corpus
    * totals riding as broadcast 1-row frames, TakeOrdered for the
    * top-k. Ranking is on the ROUNDED pmi (then gram asc) — the
    * [[tfidfTopTerms]] reproducibility rationale. */
  def pmiCollocations(df: DataFrame, idCol: String, textCol: String,
      minCount: Int, k: Int, scale: Int = 6): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      split(lower(Text.normWs(col(textCol))), " ").as("__toks"))
    val uni = toks.select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("uc"))
    val biAll = toks.select(
        explode(Text.shinglesAllFromTokens(col("__toks"), 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
    // totals BEFORE the support floor: P(ab) is over all bigram slots
    val totals = broadcast(uni.agg(sum(col("uc")).as("tu"))
      .crossJoin(broadcast(biAll.agg(sum(col("n")).as("tb")))))
    val scored = biAll.filter(col("n") >= minCount)
      .withColumn("__a", split(col("gram"), " ").getItem(0))
      .withColumn("__b", split(col("gram"), " ").getItem(1))
      .join(uni.select(col("w").as("__a"), col("uc").as("__ua")), Seq("__a"))
      .join(uni.select(col("w").as("__b"), col("uc").as("__ub")), Seq("__b"))
      .crossJoin(totals)
      .withColumn("pmi", round(log(
        (col("n").cast("double") / col("tb")) /
          ((col("__ua").cast("double") / col("tu")) *
            (col("__ub").cast("double") / col("tu")))), scale))
      .select(col("gram"), col("n"), col("pmi"))
    graft.operators.Relational.topK(k, Seq(col("pmi").desc),
      Seq(col("gram")))(scored)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists:
    * rrf(d) = Σ_lists 1/(k + rank_d), summed over the lists containing
    * d — the standard combinator for hybrid retrieval (BM25 + dense)
    * and multi-signal corpus curation (relevance × quality), robust to
    * incomparable score scales because only RANKS enter. Each input
    * frame is (id, rank) with rank 1-based; `k` dampens the head
    * (larger k flattens list influence; 60 is the paper's constant).
    * Output: (id, rrf_score, n_lists), top `topN` by (score desc, id)
    * when topN > 0 — a TakeOrdered plan, not a global sort.
    *
    * Scale note: inputs are RETRIEVAL OUTPUTS (top-k lists, bounded by
    * construction), not corpora — the union+aggregate is list-sized.
    * Rank ties must already be broken upstream (rank on rounded scores
    * with an id tiebreak, cf. [[tfidfTopTerms]]) or fusion inherits the
    * nondeterminism. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60, topN: Int = 0,
      scale: Int = 6): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val contribs = rankings.map(r =>
      r.select(col("id"), (lit(1.0) / (lit(k) + col("rank"))).as("__c")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy("id")
      .agg(round(sum(col("__c")), scale).as("rrf_score"),
        count(lit(1)).as("n_lists"))
    if (topN <= 0) fused
    else fused.orderBy(col("rrf_score").desc, col("id")).limit(topN)
  }

  /** Ranking-quality metrics for a retrieval run: graded NDCG@k
    * (gain 2^rel − 1, log₂ discount), DCG/IDCG, MRR (reciprocal rank
    * of the first relevant hit in the top k), and the relevant-doc
    * count — the eval that closes the retrieval loop ([[bm25]] ranks,
    * [[rrfFuse]] combines, this scores the ranking against labels).
    * Inputs: `ranked` (id, rank; 1-based, ties broken upstream) and
    * `rels` (id, rel; integer grades ≥ 0, 0/absent = irrelevant).
    *
    * Scale shape: only the TOP-K slice of the ranking joins labels
    * (k rows); the ideal ordering ranks the RELEVANT label set —
    * eval-set-sized by construction, so its window is bounded, not
    * corpus-bound. Both DCG sums run over ≤ k terms; outputs round
    * once. */
  def rankingMetrics(ranked: DataFrame, rels: DataFrame, k: Int,
      scale: Int = 6): DataFrame = {
    require(k >= 1)
    val topk = ranked.filter(col("rank") <= k)
      .join(rels, Seq("id"), "left")
      .withColumn("__rel", coalesce(col("rel"), lit(0)).cast("double"))
    val dcgAgg = topk.agg(
      sum((pow(lit(2.0), col("__rel")) - lit(1.0)) /
        log2(col("rank") + lit(1.0))).as("__dcg"),
      min(when(col("__rel") > 0.0, col("rank"))).as("__fr"))
    val wIdeal = Window.orderBy(col("rel").desc, col("id"))
    val idcgAgg = rels.filter(col("rel") > 0)
      .withColumn("__r", row_number().over(wIdeal))
      .filter(col("__r") <= k)
      .agg(coalesce(sum((pow(lit(2.0), col("rel").cast("double")) -
        lit(1.0)) / log2(col("__r") + lit(1.0))), lit(0.0)).as("__idcg"))
    val nRel = rels.filter(col("rel") > 0)
      .agg(count(lit(1)).as("n_relevant"))
    dcgAgg.crossJoin(idcgAgg).crossJoin(nRel)
      .select(
        lit(k).as("k"),
        col("n_relevant"),
        round(col("__dcg"), scale).as("dcg"),
        round(col("__idcg"), scale).as("idcg"),
        round(col("__dcg") /
          when(col("__idcg") =!= 0.0, col("__idcg")), scale).as("ndcg"),
        round(lit(1.0) / when(col("__fr").isNotNull,
          col("__fr").cast("double")), scale).as("mrr"))
  }

  /** Mean average precision at k over a MULTI-query ranking — the
    * set-retrieval companion to [[rankingMetrics]]' graded NDCG: AP@k
    * per query is the mean of precision@i over the relevant hits in
    * the top k, normalized by min(n_relevant, k); MAP averages across
    * queries that have at least one relevant item (the TREC
    * convention — a query with no relevant docs is undefined, not 0).
    * `ranked`: (qid, id, rank); `rels`: (qid, id, rel).
    *
    * Scale shape: only top-k slices join labels (k rows per query);
    * the running-hit window partitions by qid so queries rank in
    * parallel; per-query frames are k-bounded. */
  def mapAtK(ranked: DataFrame, rels: DataFrame, k: Int,
      scale: Int = 6): DataFrame = {
    require(k >= 1)
    val topk = ranked.filter(col("rank") <= k)
      .join(rels, Seq("qid", "id"), "left")
      .withColumn("__hit",
        (coalesce(col("rel"), lit(0)) > 0).cast("int"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("rank"))
    val ap = topk.withColumn("__cum", sum(col("__hit")).over(wq))
      .groupBy(col("qid"))
      .agg(coalesce(sum(when(col("__hit") === 1,
        col("__cum").cast("double") / col("rank"))), lit(0.0))
        .as("__sumP"))
    val nrel = rels.filter(col("rel") > 0)
      .groupBy(col("qid")).agg(count(lit(1)).as("__nr"))
    // nrel is the spine: a query WITH relevant docs but NO ranked rows
    // (the system returned nothing) must score AP = 0 and count toward
    // the mean — an inner join would silently reward empty result
    // lists by dropping the query
    nrel.join(ap, Seq("qid"), "left")
      .select(col("qid"),
        (coalesce(col("__sumP"), lit(0.0)) /
          least(col("__nr"), lit(k.toLong))).as("__ap"))
      .agg(count(lit(1)).as("n_queries"),
        round(avg(col("__ap")), scale).as("map_k"))
      .select(lit(k).as("k"), col("n_queries"), col("map_k"))
  }
}
