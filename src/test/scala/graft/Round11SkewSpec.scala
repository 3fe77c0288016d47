package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, DedupOps, RelOps, SimilarityOps, TextOps}

/** SKEW REHEARSAL (round-10 verdict tasks 1 + 7): generated hot-key /
  * hot-cluster / hot-fingerprint corpora that make the quadratic caps
  * BIND, with listener-measured shuffle-record assertions — the specs
  * that turn the "100 TB guard" comments into tested claims. Covers:
  * the shared [[DedupOps.cappedPairsFromBuckets]] downgrade, the
  * semanticPrune maxCluster cap (via [[SimilarityOps.semanticDedup]]),
  * the q265 star≡clique component equivalence, [[RelOps.saltedJoin]]
  * spreading a hot key, and [[AggOps.keySkewReport]] flagging it. */
class Round11SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Run `thunk` with temporary SQL confs, restoring previous values. */
  private def withConf[T](pairs: (String, String)*)(thunk: => T): T = {
    val prev = pairs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try thunk
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Total join-operator output rows for `df`'s execution — the metric
    * that sees a quadratic within-bucket pair emission (shuffle-write
    * records do NOT: the downstream max-aggregate combines map-side,
    * in the same stage as the join, before anything is written). Runs
    * with AQE off so the executed plan is concrete. */
  private def joinOutputRows(mk: () => DataFrame): Long =
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = mk().queryExecution.executedPlan
      plan.execute().count() // run THIS plan so ITS metrics populate
      plan.collectWithSubqueries {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
          j.metrics("numOutputRows").value
      }.sum
    }

  // ------------------------------------------------------------------
  // cappedPairsFromBuckets — the shared downgrade primitive
  // ------------------------------------------------------------------

  test("cappedPairsFromBuckets: at-or-below cap = exact all-pairs, " +
       "above cap = sorted-head star, boundary inclusive") {
    val bucket = Seq(Tuple1((1L to 10L).toArray.toSeq)).toDF("_ids")
    val allPairs = DedupOps.cappedPairsFromBuckets(bucket, "_ids", 10)
      .as[(Long, Long)].collect().toSet
    assert(allPairs.size === 45) // C(10,2)
    assert(allPairs.forall { case (a, b) => a < b })
    val star = DedupOps.cappedPairsFromBuckets(bucket, "_ids", 9)
      .as[(Long, Long)].collect().toSet
    assert(star === (2L to 10L).map(b => (1L, b)).toSet) // m−1 rows
  }

  test("cappedPairsFromBuckets: mixed bucket sizes take independent " +
       "branches; pairs stay distinct across overlapping buckets") {
    val buckets = Seq(
      Tuple1(Seq(1L, 2L, 3L)),        // small: 3 pairs
      Tuple1(Seq(1L, 2L, 3L, 4L, 5L)) // capped at 3: star (1,2..5)
    ).toDF("_ids")
    val got = DedupOps.cappedPairsFromBuckets(buckets, "_ids", 3)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L),
      (1L, 4L), (1L, 5L)))
  }

  // ------------------------------------------------------------------
  // semanticPrune maxCluster — binding on a hot cluster
  // ------------------------------------------------------------------

  /** n near-parallel 2-dim vectors (1, i·3e-4): one sign bucket under
    * any hyperplane set, pairwise cosine ≈ 1 — the boilerplate-heavy
    * mega-cluster shape the cap exists for. */
  private def hotCluster(n: Int): DataFrame =
    (0 until n).map(i => (i.toLong, Seq(1.0, i * 3e-4)))
      .toDF("vec_id", "embedding")

  test("semanticDedup maxCluster: capped run scores every member " +
       "against the min-id representative ONLY (exact sim match), " +
       "uncapped differs — the cap demonstrably binds") {
    val df = hotCluster(40)
    val capped = SimilarityOps.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.2, planes = 2, seed = 42L, maxCluster = 8)
    assert(capped.select(col("cluster")).distinct().count() === 1,
      "fixture must land in one cluster for the rehearsal to bind")
    // expected: sim(i, 0) computed through the SAME cosine expression
    val rep = df.filter(col("vec_id") === 0)
      .select(col("embedding").as("_vr")).crossJoin(
        df.filter(col("vec_id") > 0))
      .select(col("vec_id"), round(graft.functions.GraftFunctions
        .cosine_sim(col("embedding"), col("_vr")), 6).as("exp"))
    val joined = capped.filter(col("vec_id") > 0)
      .join(rep, Seq("vec_id"))
    assert(joined.filter(!(col("max_prior_sim") <=> col("exp")))
      .count() === 0, "capped sims must equal rep-anchored sims")
    // uncapped: member i's max prior sim is against i−1 (closer than
    // the rep) — at least some rows must differ, or the cap is a no-op
    val uncapped = SimilarityOps.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.2, planes = 2, seed = 42L, maxCluster = 1000)
    val diff = capped.select(col("vec_id"), col("max_prior_sim"))
      .except(uncapped.select(col("vec_id"), col("max_prior_sim")))
    assert(diff.count() > 0, "cap did not change any similarity — " +
      "the downgrade branch never ran")
    // decisions agree on this blob: everything after the rep removed
    assert(capped.filter(col("kept")).count() === 1)
    assert(uncapped.filter(col("kept")).count() === 1)
  }

  test("semanticDedup maxCluster: join-emitted rows stay linear on a " +
       "hot cluster (SQL-metric-measured, vs quadratic uncapped)") {
    val n = 300
    val df = hotCluster(n).localCheckpoint() // isolate op metrics
    val capped = joinOutputRows(() =>
      SimilarityOps.semanticDedup(df, "vec_id", "embedding",
        threshold = 0.2, planes = 2, seed = 42L, maxCluster = 16))
    val uncapped = joinOutputRows(() =>
      SimilarityOps.semanticDedup(df, "vec_id", "embedding",
        threshold = 0.2, planes = 2, seed = 42L, maxCluster = n + 1))
    // uncapped pair join emits C(300,2) ≈ 45k rows into the max-sim
    // aggregate; capped emits n−1 rep pairs. Fixed per-query joins
    // (size table ~n, decision join ~n) are shared by both runs, so a
    // 10× gap still only triggers on a genuinely quadratic emission.
    assert(uncapped > 10 * capped,
      s"expected quadratic uncapped ≫ capped, got $uncapped vs $capped")
  }

  test("cosineNearDupPairs maxBucket: a hot bucket degrades to the " +
       "m−1 representative star; uncapped emits the full clique; " +
       "capped output is a subset of uncapped") {
    val n = 40
    val df = hotCluster(n) // pairwise cosine ≈ 1, all one bucket
    val capped = SimilarityOps.cosineNearDupPairs(df, "vec_id",
      "embedding", threshold = 0.5, planes = 2, seed = 42L,
      maxBucket = 8)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val uncapped = SimilarityOps.cosineNearDupPairs(df, "vec_id",
      "embedding", threshold = 0.5, planes = 2, seed = 42L,
      maxBucket = n + 1)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(capped === (1L until n).map(b => (0L, b)).toSet,
      "capped hot bucket must be exactly the min-id star")
    assert(uncapped.size === n * (n - 1) / 2,
      "uncapped hot bucket must be the full clique")
    assert((capped -- uncapped).isEmpty,
      "the downgrade must never invent a pair")
  }

  // ------------------------------------------------------------------
  // q265 posting-list cap — star ≡ clique for connected components
  // ------------------------------------------------------------------

  test("winnow components: capped star edges give the SAME components " +
       "as uncapped clique edges on a hot-fingerprint corpus") {
    // 30 docs share one boilerplate text (every fingerprint hot),
    // 10 docs unique, 5 docs in two smaller dup groups
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val docs = ((0 until 30).map(i => (i.toLong, boiler)) ++
      (30 until 40).map(i =>
        (i.toLong, s"unique document number $i with words w$i x$i y$i z$i")) ++
      (40 until 45).map(i =>
        (i.toLong, "shared smaller group text alpha beta gamma delta epsilon")))
      .toDF("doc_id", "text")
    val fp = TextOps.winnowFingerprintTable(docs, "doc_id", "text")
    val posts = fp.groupBy(col("fp"))
      .agg(sort_array(collect_list(col("doc_id"))).as("_ids"))
      .filter(size(col("_ids")) > 1)
      .select(col("_ids")).distinct()
    assert(posts.filter(size(col("_ids")) > 4).count() > 0,
      "fixture must produce a posting list above the cap")
    def comps(maxBucket: Int): Map[Long, Long] =
      DedupOps.connectedComponents(docs.select(col("doc_id")),
          DedupOps.cappedPairsFromBuckets(posts, "_ids", maxBucket),
          "doc_id")
        .select(col("doc_id"), col("comp"))
        .as[(Long, Long)].collect().toMap
    assert(comps(4) === comps(1000000),
      "star downgrade must preserve connected components")
  }

  // ------------------------------------------------------------------
  // saltedJoin + keySkewReport — the join-side skew tools
  // ------------------------------------------------------------------

  private lazy val hotFacts = ((1 to 2000).map(i => ("hot", i.toLong)) ++
    (1 to 100).map(i => (s"k$i", i.toLong))).toDF("key", "v")
  private lazy val dims = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("key", "d")

  test("saltedJoin: identical result to the plain join on a hot-key " +
       "corpus, with the hot key spread across partitions") {
    val plain = hotFacts.join(dims, Seq("key"))
    val salted = RelOps.saltedJoin(hotFacts, dims, "key", factor = 4)
    assert(salted.select(col("key"), col("v"), col("d"))
      .except(plain.select(col("key"), col("v"), col("d")))
      .count() === 0)
    assert(plain.count() === salted.count())
    // partition-spread assertion needs the SHUFFLE join shape the salt
    // targets: pin broadcast off (a broadcast join never concentrates
    // the hot key) and AQE off (its skew splitter would mask the very
    // collapse being demonstrated)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
             "spark.sql.adaptive.enabled" -> "false") {
      def hotPartitions(df: DataFrame): Long = df
        .withColumn("_pid", spark_partition_id())
        .filter(col("key") === "hot")
        .select(col("_pid")).distinct().count()
      assert(hotPartitions(hotFacts.join(dims, Seq("key"))) === 1,
        "unsalted hot key must collapse to one shuffle partition")
      assert(hotPartitions(RelOps.saltedJoin(hotFacts, dims, "key",
        factor = 4)) > 1,
        "salt must spread the hot key across partitions")
    }
  }

  test("keySkewReport: flags the hot key's dominance (the " +
       "salting-decision input)") {
    val rep = AggOps.keySkewReport(
        hotFacts.withColumn("g", lit("all")), "g", "key")
      .collect()(0)
    assert(rep.getAs[Long]("n_keys") === 101)
    assert(rep.getAs[Double]("top_share") > 0.9)
    assert(rep.getAs[Double]("skew_factor") > 50.0)
  }

  // ------------------------------------------------------------------
  // kMeansMicro dim derivation (the round-10 ADVICE fix)
  // ------------------------------------------------------------------

  test("kMeansMicro derives the vector width from the data — a " +
       "non-64-dim corpus fits full-width centroids") {
    val df = Seq(
      (0L, Seq(0.0, 0.0, 0.0)), (1L, Seq(0.2, 0.0, 0.1)),
      (2L, Seq(1.0, 1.0, 1.0)), (3L, Seq(0.8, 1.0, 0.9)))
      .toDF("id", "v")
    val cents = SimilarityOps.kMeansMicro(df, "id", "v", k = 2, iters = 2)
    assert(cents.forall(_.length === 3))
    // Lloyd means must move ALL coordinates, not a hardcoded prefix:
    // c1 = mean of ids 2,3 = (900000, 1000000, 950000)
    assert(cents(1).toSeq === Seq(900000L, 1000000L, 950000L))
    // declared-dim mismatch fails loudly
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.kMeansMicro(df, "id", "v", k = 2, iters = 1, dim = 64)
    }
    assert(e.getMessage.contains("dim"))
  }
}
