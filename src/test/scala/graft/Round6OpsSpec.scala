package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{GraphOps, RelOps, SplitOps}

/** Round-6 operators: interval-overlap join (boundary + multi-bucket
  * dedup soundness vs the naive theta-join), triangle census
  * (hand-counted fixture; canonicalization of dirty edge lists),
  * weighted Bernoulli hash sample (determinism, rate monotonicity,
  * p=1 saturation). The registered queries q101/q103/q105 carry the
  * oracle checks on fixture data; these pin the decision boundaries.
  */
class Round6OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------------------------------------------------------- //
  // intervalOverlapJoin
  // ---------------------------------------------------------------- //

  test("intervalOverlapJoin matches the naive overlap theta-join, " +
       "including touching endpoints (hi_a == lo_b), containment, and " +
       "identical intervals") {
    val a = Seq((1L, 0L, 10L), (2L, 5L, 5L), (3L, 20L, 40L),
      (4L, 64L, 64L)).toDF("id_a", "lo_a", "hi_a")
    val b = Seq((10L, 10L, 12L), (20L, 0L, 100L), (30L, 41L, 50L),
      (40L, 5L, 5L)).toDF("id_b", "lo_b", "hi_b")
    val got = RelOps.intervalOverlapJoin(a, b, "lo_a", "hi_a", "lo_b",
        "hi_b", bucketWidth = 8L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = a.crossJoin(b)
      .filter(col("lo_a") <= col("hi_b") && col("lo_b") <= col("hi_a"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === want)
    // the fixture must actually exercise the boundary cases it claims
    assert(want.contains((1L, 10L)), "touching endpoints (10 == 10)")
    assert(want.contains((2L, 40L)), "identical degenerate intervals")
    assert(!want.contains((3L, 30L)), "adjacent-but-disjoint (40 < 41)")
  }

  test("intervalOverlapJoin emits a pair ONCE even when the intervals " +
       "share many buckets (first-common-bucket ownership, no distinct)") {
    val a = Seq((1L, 0L, 100L)).toDF("id_a", "lo_a", "hi_a")
    val b = Seq((9L, 3L, 97L)).toDF("id_b", "lo_b", "hi_b")
    // width 4 → the pair co-occupies ~24 buckets; exactly one row out
    val out = RelOps.intervalOverlapJoin(a, b, "lo_a", "hi_a", "lo_b",
      "hi_b", bucketWidth = 4L)
    assert(out.count() === 1L)
  }

  test("intervalOverlapJoin plans as an equi-join on the bucket id " +
       "(never a nested-loop over the theta predicate)") {
    val a = (0L until 64L).map(i => (i, i, i + 5)).toDF("id_a", "lo_a", "hi_a")
    val b = (0L until 64L).map(i => (i, i * 2, i * 2 + 3))
      .toDF("id_b", "lo_b", "hi_b")
    val p = RelOps.intervalOverlapJoin(a, b, "lo_a", "hi_a", "lo_b",
      "hi_b", bucketWidth = 8L).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"overlap join degraded to a cross strategy:\n${p.take(1500)}")
  }

  // ---------------------------------------------------------------- //
  // triangleStats
  // ---------------------------------------------------------------- //

  test("triangleStats counts a hand-built graph exactly once per " +
       "triangle, through duplicate / reversed / self-loop edges") {
    // K4 on {1,2,3,4} (4 triangles) plus a pendant 4-5 (no triangle),
    // fed dirty: both orientations, duplicates, and a self-loop
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (3L, 2L),
      (2L, 4L), (3L, 4L), (4L, 5L), (4L, 5L), (3L, 3L)
    ).toDF("src", "dst")
    val row = GraphOps.triangleStats(edges).collect().head
    assert(row.getLong(row.fieldIndex("n_nodes")) === 5L)
    assert(row.getLong(row.fieldIndex("n_edges")) === 7L)
    assert(row.getLong(row.fieldIndex("n_triangles")) === 4L)
  }

  test("triangleStats: triangle-free graphs (path, star) report zero") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    for (g <- Seq(path, star)) {
      val row = GraphOps.triangleStats(g).collect().head
      assert(row.getLong(row.fieldIndex("n_triangles")) === 0L)
    }
  }

  // ---------------------------------------------------------------- //
  // iteration hygiene (round-6): checkpoint cadence + unpersist
  // ---------------------------------------------------------------- //

  test("pageRank at iterations=10: localCheckpoint cadence keeps the " +
       "returned plan bounded, results match the checkpoint-free run, " +
       "and the node/edge caches are unpersisted") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val r = GraphOps.pageRank(edges, iterations = 10, damping = 0.85,
      checkpointEvery = 3)
    // the returned frame is an eagerly checkpointed leaf: without
    // lineage truncation a 10-iteration plan is >40 operators deep
    val nPlanNodes =
      r.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(nPlanNodes <= 3,
      s"expected a checkpointed leaf plan, got $nPlanNodes operators")
    // cadence must not change the numbers (checkpointEvery=99 → the
    // mid-loop truncation never fires)
    val noCp = GraphOps.pageRank(edges, iterations = 10, damping = 0.85,
        checkpointEvery = 99)
      .as[(Long, Double)].collect().toMap
    r.as[(Long, Double)].collect().foreach { case (id, rank) =>
      assert(math.abs(rank - noCp(id)) < 1e-15, s"node $id drifted")
    }
    // cache hygiene: re-deriving the exact node/edge-degree plans from
    // the same input must find NOTHING in the cache manager (lookup is
    // by plan equality — a leftover cache entry would match)
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    assert(spark.sharedState.cacheManager.lookupCachedData(nodes.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]).isEmpty,
      "pageRank left its node table cached")
    val eDeg = e.join(
      e.groupBy(col("src")).agg(count(lit(1)).as("_deg")), "src")
    assert(spark.sharedState.cacheManager.lookupCachedData(eDeg.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]).isEmpty,
      "pageRank left its edge-degree table cached")
  }

  test("triangleStats unpersists its canonical edge cache") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    GraphOps.triangleStats(edges).collect()
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") < col("b")).distinct()
    assert(spark.sharedState.cacheManager.lookupCachedData(canon.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]).isEmpty,
      "triangleStats left its edge table cached")
  }

  // ---------------------------------------------------------------- //
  // z-order layout
  // ---------------------------------------------------------------- //

  test("zValue interleaves bits exactly (hand-computed Morton codes) " +
       "and saturates the 16-bit domain") {
    import graft.ops.LayoutOps
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
        (65535L, 65535L))
      .toDF("a", "b")
      .select(LayoutOps.zValue(col("a"), col("b"))).as[Long]
      .collect().toSeq
    // z(3,5): a bits {0,1} -> even positions 0,2 = 5; b bits {0,2} ->
    // odd positions 1,5 = 34; 5 | 34 = 39
    assert(got === Seq(0L, 1L, 2L, 39L, 4294967295L))
  }

  test("zOrderLayout range-partitions on the z-value (contiguous curve " +
       "ranges per partition) and preserves the row set") {
    import graft.ops.LayoutOps
    val df = (0L until 256L).map(i => (i % 16, i / 16)).toDF("a", "b")
    val laid = LayoutOps.zOrderLayout(df, col("a"), col("b"), 4)
    val p = laid.queryExecution.executedPlan.toString
    assert("rangepartitioning\\(_z".r.findFirstIn(p.toLowerCase).isDefined,
      s"expected a range exchange on _z:\n${p.take(1200)}")
    assert(laid.count() === 256L)
  }

  // ---------------------------------------------------------------- //
  // snapshotDiff
  // ---------------------------------------------------------------- //

  test("snapshotDiff classifies added/removed/changed/unchanged, with " +
       "null-safe payload compare (NULL == NULL is unchanged)") {
    val old = Seq((1L, Some("a")), (2L, Some("b")), (3L, Option.empty[String]),
      (4L, Some("gone"))).toDF("k", "v")
    val neu = Seq((1L, Some("a")), (2L, Some("B")), (3L, Option.empty[String]),
      (5L, Some("new"))).toDF("k", "v")
    val got = RelOps.snapshotDiff(old, neu, "k")
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", 4L -> "removed", 5L -> "added"))
  }

  // ---------------------------------------------------------------- //
  // bigrams
  // ---------------------------------------------------------------- //

  test("bigrams emits exactly the adjacent pairs, in order, and the " +
       "size guard returns empty (not a reversed-sequence pair) for " +
       "0/1-token docs") {
    import graft.ops.TextOps
    val docs = Seq("a b b c", "solo", "", "x y").toDF("text")
    val got = docs
      .select(explode(TextOps.bigrams(TextOps.tokens(col("text")))).as("p"))
      .select(col("p.a"), col("p.b")).as[(String, String)].collect().toSeq
    assert(got === Seq(("a", "b"), ("b", "b"), ("b", "c"), ("x", "y")))
  }

  // ---------------------------------------------------------------- //
  // mergeUpsert
  // ---------------------------------------------------------------- //

  test("mergeUpsert covers all four outcomes: kept (base only), " +
       "updated (change wins), inserted (new key), deleted (absent)") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "tag", "v")
    val changes = Seq((2L, "B", 22.0), (3L, "DEL", 0.0), (4L, "d", 40.0),
      (5L, "DEL", 0.0)).toDF("k", "tag", "v")
    val got = RelOps.mergeUpsert(base, changes, "k",
        chg => chg.getField("tag") === "DEL")
      .select("k", "tag", "v", "action")
      .as[(Long, String, Double, String)].collect().toSet
    assert(got === Set(
      (1L, "a", 10.0, "kept"),        // untouched base row survives
      (2L, "B", 22.0, "updated"),     // change payload wins wholesale
      (4L, "d", 40.0, "inserted")))   // new key from the change batch
    // key 3 deleted; key 5's delete-of-nonexistent emits nothing
  }

  test("mergeUpsert: a change row with a NULL payload field wins " +
       "WHOLESALE — the NULL does not resurrect the base value") {
    val base = Seq((1L, Some("a"), Some(10.0)))
      .toDF("k", "tag", "v")
    val changes = Seq((1L, Option.empty[String], Some(11.0)))
      .toDF("k", "tag", "v")
    val got = RelOps.mergeUpsert(base, changes, "k", _ => lit(false))
      .select("k", "tag", "v", "action")
      .as[(Long, Option[String], Option[Double], String)].collect().toSet
    assert(got === Set((1L, None, Some(11.0), "updated")),
      "standard MERGE: the change row's NULL field must surface as NULL")
  }

  test("mergeUpsert is ONE full-outer equi-join — no window, no " +
       "second exchange after the join") {
    val base = (0L until 100L).map(i => (i, i.toDouble)).toDF("k", "v")
    val changes = (50L until 150L).map(i => (i, -i.toDouble)).toDF("k", "v")
    val p = RelOps.mergeUpsert(base, changes, "k", _ => lit(false))
      .queryExecution.executedPlan.toString
    assert(p.contains("FullOuter"), s"expected a full-outer join:\n$p")
    assert(!p.contains("Window"), s"merge must not rank/window:\n$p")
  }

  // ---------------------------------------------------------------- //
  // weightedHashSample
  // ---------------------------------------------------------------- //

  private lazy val docs = (0L until 2000L)
    .map(i => (i, 1L + i % 100))
    .toDF("id", "w")

  test("weightedHashSample is deterministic and monotone in rate " +
       "(the same key's uniform draw is reused, so a lower-rate sample " +
       "is a subset of a higher-rate one)") {
    val lo = SplitOps.weightedHashSample(docs, "id", col("w"), 0.002)
      .select("id").as[Long].collect().toSet
    val lo2 = SplitOps.weightedHashSample(docs, "id", col("w"), 0.002)
      .select("id").as[Long].collect().toSet
    val hi = SplitOps.weightedHashSample(docs, "id", col("w"), 0.01)
      .select("id").as[Long].collect().toSet
    assert(lo === lo2, "same rate must reproduce the same member set")
    assert(lo.subsetOf(hi), "raising the rate must only add members")
    assert(lo.nonEmpty && hi.size < 2000, "fixture must bind both ways")
  }

  test("weightedHashSample saturates: p = min(1, rate*w) keeps EVERY " +
       "row whose rate*weight >= 1, and rate = 0 keeps none") {
    val all = SplitOps.weightedHashSample(docs, "id", col("w") * 0 + 1000, 0.01)
    assert(all.count() === 2000L, "rate*w = 10 >= 1 must keep all rows")
    val none = SplitOps.weightedHashSample(docs, "id", col("w"), 0.0)
    assert(none.count() === 0L)
  }

  test("weightedHashSample skews toward heavy rows: the sampled mean " +
       "weight exceeds the population mean (pps by construction)") {
    val sampled = SplitOps.weightedHashSample(docs, "id", col("w"), 0.005)
      .agg(avg(col("w"))).as[Double].collect().head
    val popMean = docs.agg(avg(col("w"))).as[Double].collect().head
    assert(sampled > popMean,
      s"pps sample mean $sampled should exceed population mean $popMean")
  }

  test("weightedHashSample stays a scan-stage filter: no exchange in " +
       "the plan") {
    val p = SplitOps.weightedHashSample(docs, "id", col("w"), 0.01)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
  }
}
