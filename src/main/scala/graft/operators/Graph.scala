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
    * near-cliques), so 3-5 iterations in practice. Each round's
    * superseded label checkpoint is unpersisted once the next round is
    * materialized, so block usage stays one-round deep.
    *
    * `maxIter` is a REGIME SWITCH, not a failure bound: a graph whose
    * diameter exceeds it (pathological chains) is handed off to the
    * alternating large-star/small-star contraction ([[starContract]],
    * Kiveris et al., MR'14 — O(log^2 n) rounds independent of
    * diameter) applied to the label-contracted graph, so the work the
    * propagation rounds already did is kept. Either path returns
    * exact, fully-converged components — never partial labels.
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
      // `next` is materialized (eager checkpoint) and `changed` is
      // consumed — the previous round's blocks are dead; release them
      // so the loop holds one round of labels, not `iter` rounds
      org.apache.spark.sql.graft.Bridge.releaseFrame(labels)
      labels = next.select(col("id"), col("new_comp").as("comp"))
      iter += 1
    }
    if (changed > 0) {
      // Diameter exceeded the propagation budget (a chain-shaped
      // graph). Returning the partial labels would be WRONG (one dup
      // group reported as several components leaks through a
      // leakage-safe split) — instead contract the graph through the
      // labels converged so far (nodes sharing a label are proven
      // connected) and finish on the contracted graph with the
      // diameter-independent star contraction.
      val contracted = sym
        .join(labels.select(col("id").as("id_a"), col("comp").as("ca")),
          Seq("id_a"))
        .join(labels.select(col("id").as("id_b"), col("comp").as("cb")),
          Seq("id_b"))
        .select(col("ca").as("id_a"), col("cb").as("id_b"))
      // roots: label-id -> smallest label in its contracted component;
      // the global component min m always has comp(m)=m (min-label
      // never lowers the minimum's own label), so m IS a contracted
      // node id and the star root equals the true component min.
      val roots = starContract(contracted)
        .select(col("id").as("comp"), col("comp_root"))
      val composed = labels.join(roots, Seq("comp"), "left")
        .select(col("id"),
          coalesce(col("comp_root"), col("comp")).as("comp"))
        .localCheckpoint(true)
      org.apache.spark.sql.graft.Bridge.releaseFrame(labels)
      org.apache.spark.sql.graft.Bridge.releaseFrame(roots)
      labels = composed
    }
    nodes.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("comp"), col("id")).as("component_id"))
  }

  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14): each
    * round rewires every node toward the minimum of its neighborhood,
    * halving the height of the forest — O(log^2 n) rounds worst case,
    * INDEPENDENT of graph diameter (min-label propagation needs
    * diameter rounds, fatal on chain graphs). Input: undirected edges
    * (id_a, id_b); output (id, comp_root) for every edge ENDPOINT,
    * comp_root = smallest id in the component.
    *
    * Scale shape per round: one symmetrized self-aggregation (min per
    * neighborhood, map-side combined) and one key-repartitioned
    * rewrite — edge-list-sized shuffles of two-long rows, same as one
    * propagation round; there are just O(log^2 n) of them instead of
    * O(diameter). Convergence = the edge set reaches a fixed point
    * (every node points directly at its component min), checked with
    * one count + one except per round. Superseded rounds are
    * unpersisted as soon as the next is materialized. */
  def starContract(edges: DataFrame, maxRounds: Int = 60): DataFrame = {
    // canonical directed form u -> v with u > v (self-loops dropped):
    // both star operations emit edges pointing from larger to smaller,
    // so the invariant is stable across rounds
    var e = edges
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var rounds = 0
    var converged = e.isEmpty
    while (!converged && rounds < maxRounds) {
      // LARGE-STAR: for each node n, connect every strictly-larger
      // neighbor to min(N(n) ∪ {n}). Each undirected edge {a,b}, a<b,
      // is emitted exactly once — from a's neighborhood as (b, m(a)).
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v"))) // n = "u"
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)
      // SMALL-STAR on the directed (large -> small) edges: every node
      // n rewires its smaller neighbors AND itself to min(N(n)).
      val minsS = large.groupBy("u").agg(min(col("v")).as("m"))
      val small = large.join(minsS, Seq("u"))
        .select(col("v").as("n"), col("m"))
        .union(minsS.select(col("u").as("n"), col("m")))
        .filter(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
        .distinct()
        .localCheckpoint(true)
      org.apache.spark.sql.graft.Bridge.releaseFrame(large)
      // fixed point: the round changed nothing — every edge already
      // points at its component minimum
      converged = small.count() == e.count() && small.except(e).isEmpty
      org.apache.spark.sql.graft.Bridge.releaseFrame(e)
      e = small
      rounds += 1
    }
    if (!converged) throw new IllegalStateException(
      s"starContract did not reach a fixed point in $maxRounds rounds " +
        "— exceeds the proven O(log^2 n) bound; edge input is likely " +
        "unstable (non-deterministic ids)")
    // converged stars: every non-root endpoint appears exactly once as
    // u pointing at its root; roots label themselves. Materialized so
    // the converged edge frame's blocks can be released here rather
    // than leaking past the return.
    val labels = e.select(col("u").as("id"), col("v").as("comp_root"))
      .union(e.select(col("v").as("id"), col("v").as("comp_root"))
        .distinct())
      .localCheckpoint(true)
    org.apache.spark.sql.graft.Bridge.releaseFrame(e)
    labels
  }

  /** HITS hubs & authorities (Kleinberg 1999) by fixed-iteration
    * mutual reinforcement — the complementary authority signal to
    * [[pageRank]] on bipartite curation graphs: a GOOD SOURCE (hub)
    * links to many good items, a GOOD ITEM (authority) is linked by
    * many good sources; PageRank's single score conflates the two
    * roles. Weighted: a(j) = Σ_{i→j} w·h(i), then h(i) = Σ_{i→j}
    * w·a(j) with the FRESH authorities, each side L2-normalized per
    * round (norms ride as broadcast 1-row aggregates, the
    * [[pageRank]] dangling pattern).
    *
    * Per round: two shuffle joins of the edge list against the
    * current score frames and two eager checkpoints, superseded
    * rounds released. Normalization happens ONCE at the end: per-round
    * L2 norms are scalar factors that cannot change the fixed-point
    * direction, and materializing them mid-round forces each raw
    * contribution frame to be evaluated twice (once for the join,
    * once for the norm) — dropping them halved the measured wall on
    * the 591k-edge graded graph. Raw magnitudes grow ~(Σw)² per
    * round — fine in double for the fixed small iteration counts this
    * runs at (overflow needs ~150 rounds at 1e4 growth/round).
    * Output: (node, hub, authority), L2-normalized per side. */
  def hits(edges: DataFrame, iterations: Int = 4): DataFrame = {
    val e = edges.select(col("src"), col("dst"),
      col("weight").cast("double").as("w"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    var hubs = nodes.select(col("node"), lit(1.0).as("h"))
      .localCheckpoint(true)
    var auths = hubs.select(col("node"), col("h").as("a"))
    // Checkpointed frames carry no size stats, so Catalyst would
    // sort-merge every round — shuffling the EDGE table twice per
    // iteration. Score frames are node-set-sized: broadcast them
    // explicitly while the node count is broadcastable (measured on
    // the 591k-edge graded graph: 12.6 s -> ~5 s); beyond the gate
    // the default shuffle join is the only correct plan.
    val bcastScores = nodes.count() <= 5000000L
    def side(df: DataFrame): DataFrame =
      if (bcastScores) broadcast(df) else df
    for (it <- 1 to iterations) {
      // the authorities frame stays LAZY (r12): its only same-round
      // reader is nextH, whose broadcast exchange evaluates the
      // a-side edge join exactly once INSIDE nextH's checkpoint job —
      // materializing it separately bought a full node-frame write +
      // an extra job submission per round for a frame read once.
      // Still two edge joins per round, one checkpoint instead of
      // two. Only the FINAL round's authorities checkpoint (the
      // output join below reads them after the loop's hub frames are
      // released).
      //
      // r14 optimization: NO per-round zero-fill against the node
      // frame. After round 1 the hub frame's keys are exactly the
      // distinct srcs of e (groupBy src) and the authority frame's
      // exactly the distinct dsts, so the inner edge joins below are
      // already complete — a node absent from a score frame scored
      // 0.0 and contributed +0.0 through every edge, term for term
      // identical to dropping the row (IEEE x + 0.0 == x for the
      // finite sums here). The old per-round nodes.join(...,"left")
      // + coalesce was pure OUTPUT plumbing that cost a node-frame
      // join and a broadcast barrier per half-round; the zero-fill now
      // happens once, in the assembly join below. Isolated sf0.1 A/B
      // on the 591k-edge graded graph: 4.22 -> 4.05 s min (the sf0.1
      // rounds are checkpoint-latency-bound, so the measured win is
      // small; the removed work is 2*iterations node-frame joins,
      // which is what scales).
      val nextA0 = e.join(side(hubs.select(col("node").as("src"), col("h"))),
          Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("w") * col("h")).as("a"))
      val nextA = if (it == iterations) nextA0.localCheckpoint(true)
        else nextA0
      val nextH = e.join(side(nextA.select(col("node").as("dst"), col("a"))),
          Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(sum(col("w") * col("a")).as("h"))
        .localCheckpoint(true)
      // releaseFrame is a no-op on lazy views (the first round's
      // auths, every intermediate nextA) — safe unconditionally
      org.apache.spark.sql.graft.Bridge.releaseFrame(hubs)
      org.apache.spark.sql.graft.Bridge.releaseFrame(auths)
      auths = nextA
      hubs = nextH
    }
    val aNorm = broadcast(auths.agg(
      sqrt(sum(col("a") * col("a"))).as("__na")))
    val hNorm = broadcast(hubs.agg(
      sqrt(sum(col("h") * col("h"))).as("__nh")))
    // hub scores exist only for src nodes, authority scores only for
    // dst nodes — zero-fill BOTH against the node frame here, once,
    // instead of every round (output row set and values unchanged:
    // absent = exact 0.0, same as the old per-round coalesce)
    val out = nodes
      .join(side(hubs), Seq("node"), "left")
      .join(side(auths), Seq("node"), "left")
      .crossJoin(aNorm).crossJoin(hNorm)
      .select(col("node"),
        when(col("__nh") > 0, coalesce(col("h"), lit(0.0)) / col("__nh"))
          .otherwise(lit(0.0)).as("hub"),
        when(col("__na") > 0, coalesce(col("a"), lit(0.0)) / col("__na"))
          .otherwise(lit(0.0)).as("authority"))
      .localCheckpoint(true)
    org.apache.spark.sql.graft.Bridge.releaseFrame(e)
    org.apache.spark.sql.graft.Bridge.releaseFrame(nodes)
    org.apache.spark.sql.graft.Bridge.releaseFrame(hubs)
    org.apache.spark.sql.graft.Bridge.releaseFrame(auths)
    out
  }

  /** Weighted PageRank by fixed-iteration power method — the authority
    * signal corpus curation runs over link/citation/co-occurrence
    * graphs (Common-Crawl-style domain ranking feeding quality
    * weights). Input: `edges` with (src, dst, weight); nodes are the
    * edge endpoints. Fixed `iterations` (not a convergence test) keeps
    * the result deterministic and the oracle expressible.
    *
    * Per iteration (r12 restructure, ~one-third off the measured
    * round cost): ONE shuffle join of the weight-normalized edge list
    * against the current (node, rank) frame with a map-side-combined
    * sum per destination — the round's only heavy job, and the only
    * thing CHECKPOINTED (its output is node-set-sized). Dangling mass
    * (rank parked on nodes with no out-edges) is the conservation
    * identity 1 − Σ contrib — Σ ranks is 1 by construction, so the
    * r11 per-round anti-join against the source set (a second
    * node-frame shuffle per round, plus a srcs build at setup) bought
    * nothing the 1-row aggregate over the ALREADY-MATERIALIZED
    * contrib frame doesn't; the identity is also self-correcting
    * (the update renormalizes total rank to 1 every round). The
    * (node, rank) frame itself stays LAZY — a cheap node-frame join
    * over the contrib checkpoint, re-derived at most twice — and
    * only the final round's is materialized. Superseded contrib
    * checkpoints release once the next is materialized
    * ([[connectedComponents]] discipline), so block usage stays one
    * round deep. Total rank sums to 1 every iteration
    * (spec-asserted). */
  def pageRank(edges: DataFrame, iterations: Int = 10,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst"),
      col("weight").cast("double").as("w"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count().toDouble
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val eNorm = e.join(outW, Seq("src"))
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("p"))
      .localCheckpoint(true)
    org.apache.spark.sql.graft.Bridge.releaseFrame(e)
    val ranks0 = nodes
      .select(col("node"), (lit(1.0) / n).as("rank"))
      .localCheckpoint(true)
    var ranks = ranks0
    // same stats-blind-checkpoint issue as [[hits]]: without the
    // explicit broadcast the rank side sort-merges, reshuffling the
    // edge table every round; gate on node count (see hits)
    val bcastScores = n <= 5000000.0
    def side(df: DataFrame): DataFrame =
      if (bcastScores) broadcast(df) else df
    var contribPrev: DataFrame = null
    for (it <- 1 to iterations) {
      val contrib = eNorm
        .join(side(ranks.select(col("node").as("src"), col("rank").as("r"))),
          Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("p") * col("r")).as("contrib"))
        .localCheckpoint(true)
      // the new contrib's materialization was the last reader of the
      // previous round's (and, on round 1, of the seed ranks)
      if (contribPrev != null)
        org.apache.spark.sql.graft.Bridge.releaseFrame(contribPrev)
      if (it == 1) org.apache.spark.sql.graft.Bridge.releaseFrame(ranks0)
      contribPrev = contrib
      val dangling = broadcast(contrib.agg(
        (lit(1.0) - sum(col("contrib"))).as("__dang")))
      val raw = nodes.join(side(contrib), Seq("node"), "left")
        .crossJoin(dangling)
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("__dang") / n))
            .as("rank"))
      // lazy between rounds; only the returned frame materializes
      ranks = if (it == iterations) raw.localCheckpoint(true) else raw
    }
    if (contribPrev != null)
      org.apache.spark.sql.graft.Bridge.releaseFrame(contribPrev)
    org.apache.spark.sql.graft.Bridge.releaseFrame(eNorm)
    org.apache.spark.sql.graft.Bridge.releaseFrame(nodes)
    ranks
  }

  /** Exact triangle count + global clustering coefficient over an
    * undirected edge list (`id_a`/`id_b`; duplicates, direction and
    * self-loops don't matter). One summary row: node/edge/wedge/
    * triangle counts and 3T/wedges — the graph-cohesion profile
    * (community density of a co-occurrence or near-dup graph).
    *
    * Scale shape: the degree-ORIENTATION construction (direct every
    * edge from its (degree, id)-smaller endpoint to the larger), so
    * the wedge self-join fans out per-node by ORIENTED out-degree —
    * bounded by O(sqrt(m)) on any graph instead of the raw max degree
    * that makes naive wedge counting explode on skewed graphs (the
    * celebrity node contributes its full deg² under a naive join,
    * ~nothing under orientation). Each triangle has exactly one
    * orientation-minimal vertex, so the count is exact, not sampled:
    * wedge (v,w) out of u closes iff oriented edge v→w exists —
    * one equi-join against the oriented edge list. Frames carry ids
    * and degrees only; payloads never ride. */
  def triangleCount(edges: DataFrame, scale: Int = 6): DataFrame = {
    // canonical undirected edges: a < b, distinct, no self-loops
    val canon = edges.select(
        least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = canon.select(col("a").as("id"))
      .unionAll(canon.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    // orient by (degree, id): lower endpoint in that total order
    // becomes the source
    val withDeg = canon
      .join(deg.select(col("id").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("d").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("dd"))
      .localCheckpoint(true)
    // wedges out of each source, ordered by the same (degree, id)
    // total order so the closing edge appears exactly once in
    // `oriented` as v -> w
    val e1 = oriented.select(col("src"), col("dst").as("v"), col("dd").as("dv"))
    val e2 = oriented.select(col("src"), col("dst").as("w"), col("dd").as("dw"))
    // distinct centers can contribute the same (v,w) wedge — each is
    // its own potential triangle, so the count is over wedge ROWS
    // matching an oriented edge (oriented is already duplicate-free)
    val wedgePairs = e1.join(e2, Seq("src"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("v").as("src"), col("w").as("dst"))
    val nTri = wedgePairs
      .join(oriented.select(col("src"), col("dst")), Seq("src", "dst"))
      .count()
    // the remaining outputs are scalars — bounded 1-row collects, so
    // the checkpointed frames can be released before assembly
    val statsRow = deg.agg(
      count(lit(1)).as("n_nodes"),
      // integer DIV, not `/`: double division would round wedge counts
      // once degrees pass 2^26 (d² beyond the 53-bit mantissa)
      sum(expr("(d * (d - 1)) DIV 2")).cast("long").as("n_wedges"),
      // every canonical edge contributes one to each endpoint's degree
      sum(expr("d")).cast("long").as("__degsum"))
      .first()
    val (nNodes, nWedges) =
      (statsRow.getAs[Long]("n_nodes"), statsRow.getAs[Long]("n_wedges"))
    val nEdges = statsRow.getAs[Long]("__degsum") / 2
    org.apache.spark.sql.graft.Bridge.releaseFrame(canon)
    org.apache.spark.sql.graft.Bridge.releaseFrame(oriented)
    edges.sparkSession.range(1).select(
      lit(nNodes).as("n_nodes"), lit(nEdges).as("n_edges"),
      lit(nWedges).as("n_wedges"), lit(nTri).as("n_triangles"),
      (if (nWedges > 0)
        round(lit(3.0 * nTri / nWedges), scale).cast("double")
      else lit(null).cast("double")).as("global_clustering"))
  }

  /** PER-NODE local clustering coefficient: cc(v) = 2·T(v) /
    * (d(v)·(d(v)-1)) — how close each node's neighborhood is to a
    * clique, the node-level cohesion signal [[triangleCount]]'s one
    * summary row can't give (which parts sit inside tight co-purchase
    * cliques vs merely having many neighbors). Nodes with degree < 2
    * score 0 by convention.
    *
    * Same degree-orientation wedge construction as [[triangleCount]]
    * (O(sqrt(m)) oriented out-degree bound — skew-proof), but the
    * closing join KEEPS the wedge center, so each triangle surfaces
    * as an (u, v, w) row once and explodes to its three corners for
    * the per-node count. Output: (id, degree, n_tri, cc) for every
    * node. */
  def clusteringCoefficients(edges: DataFrame, scale: Int = 6): DataFrame = {
    val canon = edges.select(
        least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = canon.select(col("a").as("id"))
      .unionAll(canon.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    val withDeg = canon
      .join(deg.select(col("id").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("d").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("dd"))
      .localCheckpoint(true)
    val e1 = oriented.select(col("src").as("u"), col("dst").as("v"),
      col("dd").as("dv"))
    val e2 = oriented.select(col("src").as("u"), col("dst").as("w"),
      col("dd").as("dw"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("u"), col("v").as("src"), col("w").as("dst"))
    val corners = wedges
      .join(oriented.select(col("src"), col("dst")), Seq("src", "dst"))
      .select(explode(array(col("u"), col("src"), col("dst"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("__tri"))
    val out = deg.join(corners, Seq("id"), "left")
      .select(col("id"), col("d").as("degree"),
        coalesce(col("__tri"), lit(0L)).as("n_tri"),
        round(when(col("d") >= 2L,
          coalesce(col("__tri"), lit(0L)).cast("double") * 2.0 /
            (col("d") * (col("d") - 1L))).otherwise(lit(0.0)), scale)
          .as("cc"))
      .localCheckpoint(false)
    org.apache.spark.sql.graft.Bridge.releaseFrame(canon)
    org.apache.spark.sql.graft.Bridge.releaseFrame(deg)
    org.apache.spark.sql.graft.Bridge.releaseFrame(oriented)
    out
  }

  /** Community detection by synchronous label propagation (Raghavan et
    * al. 2007): every node starts as its own community and, each round,
    * adopts the most frequent label among its NEIGHBORS — ties break to
    * the smallest label, so the whole run is deterministic and
    * oracle-checkable (the classic randomized-order variant is not).
    * Input: `edges` with `id_a`/`id_b` (undirected; duplicates and
    * direction are absorbed by symmetrize+distinct). Output:
    * (id, label) for every edge endpoint.
    *
    * Scale shape per round — the [[pageRank]] posture: ONE shuffle join
    * of the symmetrized edge list against the current (id, label)
    * frame, one map-side-combined (node, label) count, and one
    * struct-argmax per node; all rows are id-width. Each round eagerly
    * checkpoints and the superseded frame is released, so block usage
    * stays one round deep. Runs a FIXED iteration count: synchronous
    * LPA on bipartite-ish regions can two-cycle rather than converge,
    * so a fixed budget is the honest contract (density floors, not
    * exactness, is what LPA offers; use [[connectedComponents]] when
    * membership must be transitive-exact). */
  def labelPropagation(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val sym = edges.select(col("id_a"), col("id_b"))
      .union(edges.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("id_a").as("id"))
      .distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      // neighbor labels for node id_a come from id_b's current label;
      // argmax by (count, smallest label) rides ONE struct min_by —
      // no window, no per-node sort. min_by on (−cnt, label), NOT
      // max_by on (cnt, −label): negating the label would cast
      // string node ids to null and silently break the documented
      // smallest-label determinism; counts are always numeric
      val next = sym
        .join(labels.select(col("id").as("id_b"), col("label")),
          Seq("id_b"))
        .groupBy(col("id_a"), col("label"))
        .agg(count(lit(1)).as("__cnt"))
        .groupBy(col("id_a").as("id"))
        .agg(min_by(col("label"),
          struct((-col("__cnt")).as("__nc"), col("label"))).as("label"))
        .localCheckpoint(true)
      org.apache.spark.sql.graft.Bridge.releaseFrame(labels)
      labels = next
    }
    org.apache.spark.sql.graft.Bridge.releaseFrame(sym)
    labels
  }

  /** k-core of an undirected graph: the maximal subgraph in which
    * every node keeps degree ≥ k, found by synchronous peeling —
    * each round drops every node whose CURRENT degree is below k
    * (and the edges touching it), until nothing changes or `rounds`
    * is exhausted. Returns the surviving nodes with their core
    * degree. Peeling is idempotent after the fixpoint, so running
    * exactly R rounds and early-exiting on an unchanged edge count
    * produce the SAME output — which is what makes a fixed-R
    * unrolled SQL oracle exact regardless of where convergence lands.
    *
    * Scale shape (round-10 fusion): edges live CANONICALLY (lo, hi)
    * — half the symmetric frame — and each round costs ONE map-side-
    * combined degree aggregate over the exploded endpoints; the peel
    * itself anti-joins against the BAD set (nodes below k this
    * round), which is exactly the shrinking frontier, so it
    * broadcasts and adds no exchange (size-gated: a degenerate first
    * round that peels millions falls back to shuffle anti-joins,
    * still no worse than the old two-semi-join plan). The r9 plan
    * spent three exchanges per round (degree groupBy + two semi-
    * joins against the LARGE keep set). Each round localCheckpoints
    * (same discipline as [[labelPropagation]]) so the loop's lineage
    * stays flat; superseded rounds release eagerly; the loop exits
    * as soon as a round peels nothing. */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 6): DataFrame = {
    require(k >= 1 && rounds >= 1)
    // nodes peeled this round stay broadcastable below the gate;
    // above it the anti-joins shuffle (degenerate mass-peel rounds)
    val broadcastGate = 5000000L
    var live = edges
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
      .localCheckpoint(true)
    var done = live.isEmpty
    var r = 0
    while (!done && r < rounds) {
      val bad = live
        .select(explode(array(col("id_a"), col("id_b"))).as("__id"))
        .groupBy(col("__id")).agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") < k)
        .select(col("__id"))
        .localCheckpoint(true)
      val nBad = bad.count()
      if (nBad == 0L) {
        org.apache.spark.sql.graft.Bridge.releaseFrame(bad)
        done = true
      } else {
        // MEASURED trade-off: the checkpointed bad set broadcasts
        // TWICE (a checkpoint's ExistingRDD defeats exchange-reuse
        // canonicalization across the analyzer's self-join dedup —
        // a .persist() variant does get a ReusedExchange but costs
        // ~+1 s/query in columnar cache build at realistic frontier
        // sizes). The double ship is bounded: the gate halves so the
        // worst-case total stays under one 5M-row broadcast's budget.
        val badA = bad.select(col("__id").as("id_a"))
        val badB = bad.select(col("__id").as("id_b"))
        val (ja, jb) =
          if (nBad <= broadcastGate / 2) (broadcast(badA), broadcast(badB))
          else (badA, badB)
        val next = live
          .join(ja, Seq("id_a"), "left_anti")
          .join(jb, Seq("id_b"), "left_anti")
          .localCheckpoint(true)
        org.apache.spark.sql.graft.Bridge.releaseFrame(live)
        org.apache.spark.sql.graft.Bridge.releaseFrame(bad)
        live = next
        // no per-round isEmpty probe (r11): a drained frame exits the
        // NEXT round through nBad==0 on an empty degree aggregate —
        // one cheap job once, instead of one extra job EVERY round
        r += 1
      }
    }
    live.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("core_degree"))
  }

  /** Multi-source BFS hop distance: every node's distance (in hops)
    * from the nearest seed, up to `maxHops` — "how far is each
    * product from the promoted set", the blast-radius query. Seeds
    * are hop 0; unreached nodes don't emit.
    *
    * Scale shape: classic frontier expansion — per hop ONE id-width
    * join (frontier × adjacency) and one anti-join against the
    * settled set, both localCheckpointed ([[kCore]] discipline).
    * Frontiers only shrink the unsettled set, so the loop exits
    * early when a frontier drains; a fixed-R unrolled oracle stays
    * exact because later rounds are no-ops. */
  def bfsHops(edges: DataFrame, seeds: DataFrame,
      maxHops: Int = 3): DataFrame = {
    require(maxHops >= 1)
    val sym = edges.select(col("id_a"), col("id_b"))
      .union(edges.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
      .localCheckpoint(true)
    var dist = seeds.select(col("id")).distinct()
      .withColumn("hops", lit(0))
      .localCheckpoint(true)
    var frontier = dist.select("id")
    var h = 1
    var done = false
    while (!done && h <= maxHops) {
      val nxt = sym
        .join(frontier.withColumnRenamed("id", "id_a"), Seq("id_a"),
          "left_semi")
        .select(col("id_b").as("id")).distinct()
        .join(dist, Seq("id"), "left_anti")
        .withColumn("hops", lit(h))
        .localCheckpoint(true)
      if (nxt.count() == 0L) {
        org.apache.spark.sql.graft.Bridge.releaseFrame(nxt)
        done = true
      } else {
        val merged = dist.unionByName(nxt).localCheckpoint(true)
        org.apache.spark.sql.graft.Bridge.releaseFrame(dist)
        dist = merged
        frontier = nxt.select("id")
      }
      h += 1
    }
    org.apache.spark.sql.graft.Bridge.releaseFrame(sym)
    dist
  }

  /** Weighted single-source(-set) shortest paths by `rounds` of
    * Bellman-Ford min-plus relaxation — the weighted sibling of
    * [[bfsHops]] (hop counts answer "how far"; weighted distance
    * answers "how strongly connected", with edge weight as cost).
    * Input: `edges` (id_a, id_b, weight ≥ 0; undirected — symmetrized
    * here, duplicates minimized away), `seeds` (id). Output:
    * (id, dist) for every node within `rounds` relaxations, dist
    * rounded to `scale` dp.
    *
    * FIXED round count, no early exit: each round is
    * dist' = min(dist, min over edges (dist[src] + w)) — a union +
    * one hash aggregate — so the result is EXACTLY the k-step
    * unrolled form an ANSI oracle can state. Paths accumulate as
    * dist[src] + w left-to-right, the same FP addition order in any
    * engine evaluating the recurrence. Per-round frames are
    * localCheckpointed and superseded rounds released (the
    * [[connectedComponents]] discipline); rounds is a small constant,
    * distance growth is the frontier's — no driver-side state. */
  def sssp(edges: DataFrame, seeds: DataFrame, rounds: Int,
      scale: Int = 6): DataFrame = {
    require(rounds >= 1)
    val sym = edges
      .select(col("id_a"), col("id_b"), col("weight").cast("double"))
      .union(edges.select(col("id_b").as("id_a"), col("id_a").as("id_b"),
        col("weight").cast("double")))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("weight")).as("weight"))
      .localCheckpoint(true)
    var dist = seeds.select(col("id")).distinct()
      .withColumn("dist", lit(0.0))
      .localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      val relaxed = sym
        .join(dist.select(col("id").as("id_a"), col("dist")), Seq("id_a"))
        .select(col("id_b").as("id"), (col("dist") + col("weight")).as("dist"))
        .unionByName(dist)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
      org.apache.spark.sql.graft.Bridge.releaseFrame(dist)
      dist = relaxed
      r += 1
    }
    org.apache.spark.sql.graft.Bridge.releaseFrame(sym)
    dist.select(col("id"), round(col("dist"), scale).as("dist"))
  }
}
