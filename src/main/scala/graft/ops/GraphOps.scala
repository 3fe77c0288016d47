package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames (the link-analysis
  * sibling of [[DedupOps.connectedComponents]]'s min-label propagation).
  *
  * Spark-first shape: one rank⋈edges join + one groupBy per iteration —
  * i.e. O(iterations) shuffles keyed on node id, never an adjacency
  * matrix or a driver-side graph. At 100 TB the edge list is the big
  * side; it is shuffled once per iteration on `src` (co-partitioned with
  * the rank table after the first exchange, so AQE reuses the layout).
  */
object GraphOps {

  /** Fixed-iteration PageRank with damping factor `damping`.
    *
    * Semantics (pinned so the oracle can reproduce them exactly):
    *  - edges are DISTINCT (src, dst) pairs; nodes = src ∪ dst;
    *  - r₀(v) = 1/N;  rᵢ₊₁(v) = (1−d)/N + d·Σ_{(u,v)∈E} rᵢ(u)/outdeg(u);
    *  - dangling-node mass is NOT redistributed (ranks then sum to < 1
    *    when sinks exist — the common "simple" variant; the oracle
    *    mirrors it term for term).
    *
    * The edge+degree table is cached: it is probed every iteration, and
    * recomputing the distinct + degree aggregate per iteration would
    * triple the scan cost. `nodes.count()` is the one driver action —
    * O(1) result, same convention as `ivfCentroids`.
    *
    * Iteration hygiene (the two things that kill iterative plans in a
    * long-lived session): the rank table is `localCheckpoint`ed every
    * `checkpointEvery` iterations — without lineage truncation the plan
    * deepens by one join+aggregate per round and the optimizer re-walks
    * the whole chain each time — and the final ranks are eagerly
    * checkpointed too, so the cached node/edge tables can be unpersisted
    * in a `finally` BEFORE the caller ever materializes the result (the
    * returned frame's lineage is a materialized leaf, not a plan into
    * the caches). `localCheckpoint` blocks are reclaimed by the context
    * cleaner when the returned frame is garbage-collected.
    */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double,
               checkpointEvery: Int = 5): DataFrame = {
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("_deg"))
    val eDeg = e.join(outDeg, "src").cache()
    try {
      val n = nodes.count().toDouble
      val base = (1.0 - damping) / n
      var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
      for (i <- 1 to iterations) {
        val contribs = eDeg.join(ranks, eDeg("src") === ranks("id"))
          .select(eDeg("dst").as("id"),
            (col("rank") / col("_deg")).as("_c"))
          .groupBy(col("id")).agg(sum(col("_c")).as("_contrib"))
        ranks = nodes.join(contribs, Seq("id"), "left")
          .select(col("id"),
            (lit(base) + lit(damping) * coalesce(col("_contrib"), lit(0.0)))
              .as("rank"))
        if (i % checkpointEvery == 0 && i < iterations)
          ranks = ranks.localCheckpoint()
      }
      ranks.localCheckpoint()
    } finally {
      nodes.unpersist()
      eDeg.unpersist()
    }
  }

  /** SYNCHRONOUS LABEL-PROPAGATION COMMUNITIES (Raghavan, Albert &
    * Kumara 2007, the fixed-iteration deterministic variant): labels
    * initialize to the node id; each round EVERY node simultaneously
    * adopts the most frequent label among its undirected neighbors,
    * ties broken by the SMALLEST label (a node with no neighbors
    * keeps its own — cannot occur in an edge-list graph but the rule
    * is pinned for the oracle). The classic async LPA's visit order
    * is engine-defined and unreproducible; the synchronous sweep +
    * total tie order + fixed `iterations` make the result replay
    * bit-for-bit in any engine (the oracle unrolls the rounds as
    * CTEs — the kmeansSqlChain technique). Synchronous LPA can
    * two-cycle on bipartite structures; a fixed iteration budget is
    * the standard cut-off and part of the pinned semantics.
    *
    * SCALE: the symmetrized DISTINCT edge list is cached (probed
    * every round); each round is ONE labels⋈edges equi-join keyed on
    * node id + a (node, label) hash aggregate + a per-node argmax via
    * `max_by(label, struct(count, −label))` — partial-aggregable, no
    * rank window, so per-round shuffle volume is O(edges) then
    * O(nodes · distinct neighbor labels). Label tables follow the
    * [[pageRank]] checkpoint cadence so plan depth stays
    * O(checkpointEvery). Returns (id, lab). */
  def labelPropagation(edges: DataFrame, iterations: Int,
                       checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val und = e0.union(e0.select(col("dst").as("src"),
      col("src").as("dst"))).distinct().cache()
    try {
      var labels = und.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lab"))
      for (i <- 1 to iterations) {
        val picked = und
          .join(labels.select(col("id").as("_sid"), col("lab")),
            col("src") === col("_sid"))
          .groupBy(col("dst"), col("lab"))
          .agg(count(lit(1)).as("_c"))
          .groupBy(col("dst").as("id"))
          .agg(max_by(col("lab"),
            struct(col("_c"), (-col("lab")).as("_nl"))).as("_new"))
        labels = labels.join(picked, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("_new"), col("lab")).as("lab"))
        if (i % checkpointEvery == 0 && i < iterations)
          labels = labels.localCheckpoint()
      }
      labels.localCheckpoint()
    } finally und.unpersist()
  }

  /** NEWMAN MODULARITY of a community assignment (the quality readout
    * for [[labelPropagation]] — the q274 move repeated for graphs:
    * partition quality becomes a HASH-CHECKED quantity, not a
    * judgment call): Q = Σ_c [e_c/m − (d_c/2m)²] over the canonical
    * undirected edge set, with e_c = intra-community edges, d_c =
    * total degree of community c, m = edge count.
    *
    * EXACT-INTEGER spelling (the q186 convention): Q = Σ_c (4·m·e_c −
    * d_c²) / (4·m²) — numerators are exact longs summed order-free,
    * the single float step is the final divide (safe while m·e_c <
    * 2^61, i.e. to ~1.5e9 edges). Communities with no intra edges
    * contribute −d_c² exactly (left-join coalesce).
    *
    * SCALE: canonicalize once (min/max endpoint, distinct); degrees =
    * one hash aggregate over 2·m endpoint rows; e_c = two id-keyed
    * equi-joins of the edge list against the assignment; everything
    * after is community-domain-bounded. Returns one row
    * (n_communities, m_edges, q_modularity). */
  def modularity(edges: DataFrame, assign: DataFrame,
                 idCol: String = "id", labCol: String = "lab")
      : DataFrame = {
    val ce = edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // consumers: m, degrees, intra-edge counts
    val lab = assign.select(col(idCol).cast("long").as("_id"),
      col(labCol).as("_lab"))
    val m = ce.agg(count(lit(1)).as("m"))
    val dc = ce.select(col("a").as("_id"))
      .unionAll(ce.select(col("b").as("_id")))
      .groupBy(col("_id")).agg(count(lit(1)).as("_deg"))
      .join(lab, "_id")
      .groupBy(col("_lab")).agg(sum(col("_deg")).as("d_c"))
    val ec = ce
      .join(lab.select(col("_id").as("a"), col("_lab").as("_la")), "a")
      .join(lab.select(col("_id").as("b"), col("_lab").as("_lb")), "b")
      .filter(col("_la") === col("_lb"))
      .groupBy(col("_la").as("_lab")).agg(count(lit(1)).as("e_c"))
    dc.join(ec, Seq("_lab"), "left")
      .crossJoin(broadcast(m))
      .select((lit(4L) * col("m") * coalesce(col("e_c"), lit(0L)) -
        col("d_c") * col("d_c")).as("_num"), col("m"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_communities"), sum(col("_num")).as("_s"))
      .select(col("n_communities"), col("m").as("m_edges"),
        round(col("_s").cast("double") /
          (lit(4.0) * col("m") * col("m")), 6).as("q_modularity"))
  }

  /** Triangle count over an undirected edge list. Edges are first
    * CANONICALIZED (a = min endpoint, b = max, self-loops dropped,
    * distinct) so each undirected edge appears once as a < b; a
    * triangle {x < y < z} is then counted exactly once by the
    * two-join wedge closure e1(x,y) ⋈ e2(y,z) ⋈ e3(x,z).
    *
    * Scale: the a < b orientation is the degree-bound trick in id
    * space — every wedge is enumerated from its SMALLEST vertex only,
    * so the join fan-out per vertex is C(outdeg,2) on the oriented
    * out-degree (≤ total degree; for production skew the orientation
    * key would be (degree, id) rather than id, same plan). Both joins
    * are equi-joins on a single node id — hash exchanges on node id,
    * no broadcast of the (big) edge list, AQE free to re-plan the
    * closure probe. Returns one row: n_nodes, n_edges, n_triangles.
    *
    * The canonical edge table is cached (probed by four subtrees:
    * both wedge sides, the closure probe, and the node/edge counts)
    * and unpersisted in a `finally` — the three counts are collected
    * eagerly (O(1) driver results, the nodes.count() convention), so
    * the returned one-row frame holds no lineage into the cache. */
  /** Single-source shortest path (unweighted hop count), bounded at
    * `maxHops` — the reachability member of the graph family next to
    * [[pageRank]]'s rank propagation and `connectedComponents`' label
    * flood.
    *
    * Semantics (pinned so a recursive-CTE oracle can reproduce them):
    *  - edges are DISTINCT directed (src, dst) pairs (callers pass a
    *    symmetrized list for undirected semantics);
    *  - `source` is a ONE-ROW frame with column `id` (relational, so
    *    a computed seed — e.g. min node — needs no driver action);
    *  - output = (id, dist) for every node reachable within `maxHops`
    *    hops, dist = minimum hop count, source at dist 0; unreachable
    *    nodes are omitted.
    *
    * Scale shape: classic frontier BFS — each hop is ONE equi-join of
    * the (small) frontier against the edge list keyed on src plus one
    * anti-join against the known set, so the per-hop shuffle moves
    * O(frontier ⋈ edges) rows and each node enters `dist` exactly
    * once. The recursive-CTE spelling the oracle uses materializes
    * every (node, walk-length ≤ k) pair — fine at fixture scale,
    * quadratic in path multiplicity at 100 TB; the anti-join frontier
    * is the scale-safe variant. The edge list is cached (probed once
    * per hop) and unpersisted in a `finally`; the frontier is
    * localCheckpoint'ed every hop (it is probed twice — the union and
    * the next expansion — and would otherwise re-run the whole prefix
    * per consumer), `dist` on the [[pageRank]] cadence so plan depth
    * stays O(checkpointEvery), not O(maxHops). */
  def shortestPaths(edges: DataFrame, source: DataFrame, maxHops: Int,
                    checkpointEvery: Int = 3): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    try {
      var dist = source.select(col("id"), lit(0).as("dist"))
        .localCheckpoint()
      var frontier = dist.select(col("id"))
      for (h <- 1 to maxHops) {
        val next = frontier.join(e, frontier("id") === e("src"))
          .select(e("dst").as("id")).distinct()
        frontier = next.join(dist, Seq("id"), "left_anti")
          .localCheckpoint()
        dist = dist.union(frontier.select(col("id"), lit(h).as("dist")))
        if (h % checkpointEvery == 0 && h < maxHops)
          dist = dist.localCheckpoint()
      }
      dist.localCheckpoint()
    } finally e.unpersist()
  }

  def triangleStats(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val e = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") < col("b")).distinct().cache()
    try {
      val wedges = e.select(col("a").as("x"), col("b").as("y"))
        .join(e.select(col("a").as("y"), col("b").as("z")), "y")
      val tri = wedges.join(
        e.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
      val nodes = e.select(col("a").as("id"))
        .union(e.select(col("b").as("id"))).distinct()
      val nNodes = nodes.count()
      val nEdges = e.count()
      val nTriangles = tri.count()
      import spark.implicits._
      Seq((nNodes, nEdges, nTriangles))
        .toDF("n_nodes", "n_edges", "n_triangles")
    } finally e.unpersist()
  }

  /** k-CORE decomposition membership (the densest-subgraph peeling
    * primitive — graph family sibling of pageRank / triangles /
    * components / shortestPaths): iteratively remove nodes of degree
    * < k until a fixpoint; what survives is the maximal subgraph
    * where every node keeps ≥ k neighbors. The k-core is UNIQUE for
    * any removal order, so partitioning never changes the result.
    *
    * Relational loop with the pageRank/connectedComponents hygiene:
    * degrees = one hash aggregate over the surviving edge set
    * (re-filtered by two semi-joins); each iteration's survivor set
    * is localCheckpoint'ed and the PREVIOUS checkpoint released as
    * soon as the next materializes (the round-9 q57 fix); the
    * canonical edge set is checkpointed once and released in
    * `finally`. Terminates when an iteration drops nobody. Returns
    * (node, degree) within the core. */
  def kCore(edges0: DataFrame, k: Int, maxIter: Int = 30): DataFrame = {
    val und = edges0.select(col("src").cast("long"),
        col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
    val edges = und.union(und.select(col("dst").as("src"),
        col("src").as("dst")))
      .distinct()
      .localCheckpoint() // the loop re-filters this every iteration
    def coreEdges(survivors: DataFrame) = edges
      .join(survivors.select(col("node").as("src")), Seq("src"),
        "left_semi")
      .join(survivors.select(col("node").as("dst")), Seq("dst"),
        "left_semi")
    try {
      var survivors = edges.select(col("src").as("node")).distinct()
        .localCheckpoint()
      var dropped = true
      var iter = 0
      while (dropped && iter < maxIter) {
        val next = coreEdges(survivors)
          .groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("_deg"))
          .where(col("_deg") >= k)
          .select(col("node"))
          .localCheckpoint()
        dropped = next.count() < survivors.count()
        val prev = survivors
        survivors = next
        prev.unpersist()
        iter += 1
      }
      // Peeling can need O(n) rounds on cascade graphs (a path at
      // k = 2 sheds one endpoint per round). Exiting before the
      // fixpoint would silently return non-core nodes — fail loudly
      // instead; callers raise maxIter for slow-converging graphs.
      require(!dropped,
        s"kCore did not reach the peeling fixpoint in maxIter=$maxIter " +
          "iterations; raise maxIter (cascade graphs need O(n) rounds)")
      coreEdges(survivors)
        .groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("degree"))
        .localCheckpoint()
    } finally {
      edges.unpersist()
    }
  }

  /** HITS hubs & authorities (Kleinberg 1999) — fixed-iteration,
    * EXACT-INTEGER fixed point (the q249/LPA determinism move applied
    * to link analysis): over the DISTINCT directed edge set, each
    * round computes raw hub scores h'(u) = Σ_{u→v} a(v), rescales to
    * the L∞-normalized integer grid h(u) = h'(u)·10⁶ div max h'
    * (max-normalization is a published HITS variant — normalization
    * choice affects only scale, not ranking or convergence — and
    * integer `div` by a positive max replays exactly in any engine),
    * then authorities a'(v) = Σ_{u→v} h(u) likewise. Scores start at
    * 10⁶; a node with no out-edges holds hub 0, no in-edges →
    * authority 0. Every quantity is a long — the whole trajectory
    * hash-compares through an unrolled-CTE oracle (the lpaSqlChain
    * technique).
    *
    * SCALE: the distinct edge list is cached and probed every
    * half-round (one score⋈edges equi-join + one node-keyed sum
    * aggregate — map-side combinable, O(edges) shuffle per
    * half-round); the normalizing max is a 1-row broadcast, never a
    * collect. Each half-round's NODE-sized score table is
    * localCheckpoint'ed before the rescale reads it twice (the max
    * agg + the join): unlike [[pageRank]]'s every-5 cadence, the
    * rescale's self-reference would otherwise recompute the upstream
    * chain on BOTH branches — 2× per half-round compounds to 2^(2·i)
    * (measured: 20.7 s → 0.8 s at 3 iterations on the 100-node q304
    * graph).
    * Magnitudes: scores ≤ 10⁶, so a raw sum ≤ 10⁶·max-degree and the
    * div rescale's 10⁶ product (raw·10⁶ < 2⁶³) bounds max-degree at
    * ~9.2·10⁶ — dense-hub graphs past that need a widened rescale.
    * Returns (id, hub_micro, auth_micro). */
  def hits(edgesIn: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edgesIn.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().cache()
    try {
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
        .localCheckpoint()
      def rescale(rawIn: DataFrame, scoreCol: String): DataFrame = {
        val raw = rawIn.localCheckpoint() // feeds the max AND the join
        val mx = raw.agg(max(col("_raw")).as("_mx"))
        nodes.join(raw, Seq("id"), "left")
          .crossJoin(broadcast(mx))
          .select(col("id"), coalesce(
            expr("_raw * 1000000L div _mx"), lit(0L)).as(scoreCol))
          .localCheckpoint() // plan depth stays O(1) across rounds
      }
      var auth = nodes.select(col("id"), lit(1000000L).as("auth"))
      var hub: DataFrame = null
      for (_ <- 1 to iterations) {
        hub = rescale(e.join(auth.select(col("id").as("_aid"),
              col("auth")), col("dst") === col("_aid"))
            .groupBy(col("src").as("id"))
            .agg(sum(col("auth")).as("_raw")), "hub")
        auth = rescale(e.join(hub.select(col("id").as("_hid"),
              col("hub")), col("src") === col("_hid"))
            .groupBy(col("dst").as("id"))
            .agg(sum(col("hub")).as("_raw")), "auth")
      }
      hub.join(auth, Seq("id"))
        .select(col("id"), col("hub").as("hub_micro"),
          col("auth").as("auth_micro"))
    } finally e.unpersist()
  }
}
