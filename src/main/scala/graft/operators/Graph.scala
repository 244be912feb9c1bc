package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives needed by the dedup family: near-dup
  * candidate pairs form a graph whose connected components are the
  * duplicate groups. [[graft.llm.Dedup.minhashClusters]] uses a
  * single-pass min-neighbor contraction (documented clique
  * assumption); this operator is the exact transitive closure for
  * graphs where chains matter (A~B, B~C, no A~C edge — progressive
  * paraphrase, shingled near-dup drift).
  */
object Graph {

  /** Connected components by iterative min-label propagation: every
    * node's label converges to the smallest node id reachable from it.
    * Input: `nodes` with an `id` column (every vertex, including
    * isolated ones), `edges` with `id_a`/`id_b` (undirected; direction
    * and duplicates don't matter). Output: (id, component_id).
    *
    * Scale shape: per iteration ONE shuffle join of the (symmetrized)
    * edge list against the current (id, label) frame, one
    * map-side-combined min aggregate, and one id-keyed label update —
    * all carrying 16-byte rows, never payloads. The loop runs until no
    * label changes (one driver-side count per iteration, the same
    * bounded-action pattern as BPE training), which takes at most the
    * graph diameter — near-dup graphs are shallow (dup groups are
    * near-cliques), so 3-5 iterations in practice. `maxIter` is a
    * backstop, not a tuning knob — hitting it THROWS rather than
    * returning silently-wrong (unconverged) labels, because a split
    * keyed on them would leak; the alternating large-star/
    * small-star contraction (Kiveris et al., MR'14) brings worst-case
    * rounds to O(log^2 n) if a pathological chain graph ever shows up.
    * Labels are localCheckpoint'ed each round so the loop's lineage
    * (and codegen depth) stays flat.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    // materialized ONCE: the edge frame is re-joined every propagation
    // round, and callers hand in arbitrarily expensive pipelines (the
    // exact-jaccard pair join costs more than all the rounds together —
    // measured 8.7 s -> un-recomputed here); checkpointing also keeps
    // each round's plan flat instead of growing by the edge subtree
    val sym = edges.select(col("id_a"), col("id_b"))
      .union(edges.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .filter(col("id_a") =!= col("id_b"))
      .localCheckpoint(true)
    // the loop carries labels for edge ENDPOINTS only — an isolated
    // node's label can never change, and in a dedup graph endpoints
    // (docs with at least one near-dup) are a small fraction of the
    // corpus; singletons re-attach map-only after convergence
    var labels = sym.select(col("id_a").as("id")).distinct()
      .join(nodes.select(col("id")), Seq("id"), "left_semi")
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("id_b"), col("comp").as("nc")),
          Seq("id_b"))
        .groupBy(col("id_a").as("id"))
        .agg(min(col("nc")).as("nbr_comp"))
      val next = labels.join(nbrMin, Seq("id"))
        .select(col("id"), col("comp"),
          least(col("comp"), col("nbr_comp")).as("new_comp"))
        .localCheckpoint(true)
      changed = next.filter(col("new_comp") =!= col("comp")).count()
      labels = next.select(col("id"), col("new_comp").as("comp"))
      iter += 1
    }
    // Unconverged labels are WRONG labels: one dup group reported as
    // several components means a leakage-safe split quietly leaks —
    // fail loudly rather than return them. Hitting this needs a chain
    // of diameter > maxIter, which no near-clique dup graph produces;
    // if one ever appears, raise maxIter or switch this loop to
    // large-star/small-star contraction (O(log^2 n) rounds).
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing); graph diameter exceeds maxIter")
    nodes.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("comp"), col("id")).as("component_id"))
  }
}
