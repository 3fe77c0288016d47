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
}
