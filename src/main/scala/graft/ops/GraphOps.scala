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
}
