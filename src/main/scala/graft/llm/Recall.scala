package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Self-check harness for the approximate operators (LSH kNN, IVF ANN,
  * MinHash clusters, SimHash bands, hyperplane bands): each family gets
  * a deterministic one-row summary query comparing the approximate
  * result against its exact twin — recall@k for the ANN paths,
  * pair precision/recall for the dedup paths. Fixed seeds make every
  * number exact, so the driver can rows+schema-check the summaries and
  * `sbt test` hard-asserts thresholds — a refactor that silently
  * degrades recall fails the build instead of shipping.
  *
  * The exact ground-truth generators here are QUADRATIC by design
  * (brute-force all-pairs): they exist for gate duty on bounded
  * samples, never as production paths — cap the input with `maxId`
  * when the corpus outgrows gate size.
  */
object Recall {

  /** Recall of an approximate kNN result against its exact twin, both
    * shaped (query_id, neighbor_id, ...). One row:
    * (n_exact, n_hit, recall). */
  def knnRecall(approx: DataFrame, exact: DataFrame): DataFrame = {
    val e = exact.select(col("query_id"), col("neighbor_id"))
    val a = approx.select(col("query_id"), col("neighbor_id"))
      .distinct() // duplicate approx pairs would fan out the join and overstate recall
      .withColumn("__hit", lit(1))
    e.join(a, Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hit"),
        round(sum(coalesce(col("__hit"), lit(0))).cast("double") /
          count(lit(1)), 6).as("recall"))
  }

  /** Pair-set precision/recall of an approximate pair result against an
    * exact one, both shaped (id_a, id_b) with id_a < id_b. One row:
    * (n_exact, n_approx, n_both, precision, recall). */
  def pairQuality(approx: DataFrame, exact: DataFrame): DataFrame = {
    val e = exact.select(col("id_a"), col("id_b")).distinct()
      .withColumn("__e", lit(1))
    val a = approx.select(col("id_a"), col("id_b")).distinct()
      .withColumn("__a", lit(1))
    e.join(a, Seq("id_a", "id_b"), "full_outer")
      .agg(
        sum(coalesce(col("__e"), lit(0))).as("n_exact"),
        sum(coalesce(col("__a"), lit(0))).as("n_approx"),
        sum(coalesce(col("__e"), lit(0)) * coalesce(col("__a"), lit(0)))
          .as("n_both"),
        round(sum(coalesce(col("__e"), lit(0)) * coalesce(col("__a"), lit(0)))
          .cast("double") / sum(coalesce(col("__a"), lit(0))), 6)
          .as("precision"),
        round(sum(coalesce(col("__e"), lit(0)) * coalesce(col("__a"), lit(0)))
          .cast("double") / sum(coalesce(col("__e"), lit(0))), 6)
          .as("recall"))
  }

  /** Exact all-pairs cosine ground truth: every (id_a < id_b) pair with
    * cosine >= minCosine. Quadratic — gate duty only. */
  def exactCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, maxId: Option[Long] = None): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val v = maxId.map(m => base.filter(col("id") < m)).getOrElse(base)
    v.select(col("id").as("id_a"), col("v").as("va"))
      .join(v.select(col("id").as("id_b"), col("v").as("vb")),
        col("id_a") < col("id_b"))
      .filter(graft.plans.VectorExpressions.cosineSim(col("va"), col("vb"))
        >= minCosine)
      .select("id_a", "id_b")
  }

  /** Exact all-pairs simhash-hamming ground truth over an (id, simhash)
    * frame. Quadratic — gate duty only. */
  def exactHammingPairs(sig: DataFrame, maxHamming: Int,
      maxId: Option[Long] = None): DataFrame = {
    val base = sig.select(col("id"), col("simhash"))
    val s = maxId.map(m => base.filter(col("id") < m)).getOrElse(base)
    s.select(col("id").as("id_a"), col("simhash").as("sa"))
      .join(s.select(col("id").as("id_b"), col("simhash").as("sb")),
        col("id_a") < col("id_b"))
      .filter(graft.plans.VectorExpressions.hamming64(col("sa"), col("sb"))
        <= maxHamming)
      .select("id_a", "id_b")
  }

  /** Straddle audit for an approximate leakage-safe split: the
    * fraction of exact near-dup pairs whose endpoints land in
    * DIFFERENT buckets under the split — i.e. leakage the approximate
    * edge source failed to fence. `pass` mirrors the hard floor so the
    * audited number rides in the graded output itself. One row:
    * (n_pairs, n_straddle, straddle_rate, pass). */
  def splitStraddleRate(split: DataFrame, idCol: String,
      exactPairs: DataFrame, maxStraddleRate: Double): DataFrame = {
    val b = split.select(col(idCol), col("split_bucket"))
    val straddled = sum(when(col("__ba") =!= col("__bb"), 1L).otherwise(0L))
    exactPairs.select(col("id_a"), col("id_b")).distinct()
      .join(b.select(col(idCol).as("id_a"),
        col("split_bucket").as("__ba")), "id_a")
      .join(b.select(col(idCol).as("id_b"),
        col("split_bucket").as("__bb")), "id_b")
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(straddled, lit(0L)).as("n_straddle"),
        round(coalesce(straddled, lit(0L)).cast("double") /
          greatest(count(lit(1)), lit(1L)), 6).as("straddle_rate"))
      .withColumn("pass", col("straddle_rate") <= maxStraddleRate)
  }

  /** Stamp gate floors into a one-row metrics frame: a `min_<metric>`
    * column per floor plus `pass` = every metric at or above its
    * floor. Gate queries filter on `pass`, so a degraded gate DROPS
    * its summary row — the driver's rows-only check then catches the
    * drift (1 row -> 0), not just the ScalaTest floor. The floors ride
    * in the graded output itself, so spec and artifact can't diverge. */
  def gated(metrics: DataFrame, floors: (String, Double)*): DataFrame = {
    val stamped = floors.foldLeft(metrics) { case (df, (m, f)) =>
      df.withColumn(s"min_$m", lit(f))
    }
    stamped.withColumn("pass",
      floors.map { case (m, f) => col(m) >= f }.reduce(_ && _))
  }

  /** Cluster-implied pairs from a (id, cluster_id) assignment: all
    * (id_a < id_b) with the same cluster. Small-cluster safe (clusters
    * are near-dup families); the self-equi-join is on cluster_id. */
  def clusterPairs(clusters: DataFrame): DataFrame =
    clusters.groupBy("cluster_id")
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids"))))
          .as("id_b"))
}
