package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regressions for the registered queries: the shapes
  * that decide 100 TB viability — pushed filters, pruned scans,
  * broadcast dimension joins, heap-based top-k — must not silently
  * degrade as queries evolve. (Correctness hashing can't see these.)
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q02: every filter reaches the parquet scan; schema pruned") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"filters not pushed:\n${p.take(2000)}")
    // 11-column table, 6-column read (the 4 filter cols + 2 projected)
    val read = "ReadSchema: [^\n]*".r.findFirstIn(p).get
    assert(!read.contains("l_returnflag") && !read.contains("l_tax"),
      s"scan reads unused columns: $read")
  }

  test("q03: all three dimensions broadcast (no fact-side shuffle join)") {
    val p = planOf("q03_star_join")
    assert("BroadcastHashJoin".r.findAllIn(p).length === 3, p.take(1500))
    assert(!p.contains("SortMergeJoin"), "star join degraded to SMJ")
  }

  test("q14: global top-k plans as TakeOrderedAndProject, no full sort") {
    val p = planOf("q14_top_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(1000))
    assert(!p.contains("Exchange rangepartitioning"),
      "top-k is doing a global sort")
  }

  test("q04: anti join present; orders side projects only the key") {
    val p = planOf("q04_anti_join")
    assert(p.contains("LeftAnti"), p.take(1000))
    val orderScan = p.split("\n").filter(l =>
      l.contains("orders.parquet") && l.contains("ReadSchema"))
    assert(orderScan.nonEmpty &&
      orderScan.head.contains("struct<o_custkey:bigint>"),
      s"anti-join probe should read only o_custkey: ${orderScan.mkString}")
  }

  test("q27: as-of join costs ONE hash exchange on the key (merge-sort " +
       "formulation, no range cross-join)") {
    val p = planOf("q27_asof_join")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length === 1,
      s"asof should shuffle both sides once via the union:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "asof must not degrade to a cross-join strategy")
  }

  test("q82: gap-tolerant as-of keeps the single-exchange merge-sort " +
       "shape (the gap test must not add a join or exchange)") {
    val p = planOf("q82_asof_tolerance")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length === 1,
      s"asof+gap should still shuffle once via the union:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "asof+gap must not degrade to a cross-join strategy")
  }

  test("q85: quantized ANN joins broadcast the (tiny) query side and " +
       "carry int8 vectors, not the double originals") {
    val p = planOf("q85_ann_quantized")
    assert(p.contains("BroadcastHashJoin"),
      s"query side should broadcast onto the corpus buckets:\n${p.take(1500)}")
    // the join output must not resurrect the full-precision arrays —
    // only the int8 projections (_qq/_cq) feed the scorer
    val joinLine = p.split("\n").find(_.contains("BroadcastHashJoin"))
    assert(joinLine.exists(l => !l.contains("_qv") && !l.contains("_cv")),
      s"full-precision vectors cross the join: ${joinLine.getOrElse("")}")
  }

  test("q86: bucketed join plans with NO Exchange below the merge join " +
       "(the pre-shuffled layout IS the shuffle)") {
    val p = planOf("q86_bucketed_join")
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected SortMergeJoin in:\n${p.take(1500)}")
    assert(!p.substring(joinIdx).contains("Exchange"),
      s"bucketed join re-shuffled its inputs:\n${p.substring(joinIdx).take(1000)}")
  }

  test("q87: the event-type filter resolves to PARTITION pruning, not " +
       "a data filter") {
    val p = planOf("q87_partition_prune")
    assert("PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(p).isDefined,
      s"expected a partition filter on event_type:\n${p.take(1500)}")
    // pruned at the directory level → no pushed DATA filter needed on it
    assert(!"PushedFilters: \\[[^\\]]*event_type".r.findFirstIn(p).isDefined,
      "event_type leaked into data filters — pruning failed")
  }

  test("q88: repetition signals are a pure projection — no hash " +
       "exchange anywhere; the only exchange is the output-order sort; " +
       "tokens and shingles each materialize ONCE (two-projection)") {
    val p = planOf("q88_repetition_stats")
    assert(!p.contains("Exchange hashpartitioning"),
      s"per-row fold should not shuffle:\n${p.take(1500)}")
    assert("Exchange rangepartitioning".r.findAllIn(p).length === 1,
      "expected exactly the deterministic output sort")
    assert("split\\(".r.findAllIn(p).length === 1,
      s"q88 re-tokenizes per signal:\n${p.take(1200)}")
  }

  test("q89: domain cap is the bounded-heap CollectTopK aggregate — " +
       "one host exchange carrying partial-capped buffers, NO rank " +
       "window (a mega-host must not serialize through one task)") {
    val p = planOf("q89_domain_cap")
    assert("Exchange hashpartitioning\\(host".r.findAllIn(p).length === 1,
      s"expected exactly one exchange on host:\n${p.take(1500)}")
    assert(!p.contains("Window"),
      s"cap degraded to a rank window:\n${p.take(1500)}")
    assert(p.toLowerCase.contains("collect_top_k") ||
           p.toLowerCase.contains("collecttopk"),
      s"expected the CollectTopK aggregate in the plan:\n${p.take(1500)}")
  }

  test("q90: the shipdate filter pushes into the ORC scan") {
    val p = planOf("q90_orc_roundtrip")
    assert(p.toLowerCase.contains("orc"), "expected an ORC scan")
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined,
      s"shipdate filter not pushed into the ORC scan:\n${p.take(2000)}")
  }

  test("q94: the four-stage pipeline costs TWO hash exchanges total — " +
       "the dedup digest and the packing group; gate + sample threshold " +
       "are scan-stage filters") {
    val p = planOf("q94_pipeline_e2e")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 2,
      s"expected exactly dedup(_h) + packing(lang) exchanges:\n${p.take(2000)}")
    assert("Exchange rangepartitioning".r.findAllIn(p).length === 1,
      "expected exactly the deterministic output sort")
  }

  test("q253: the curation capstone's mixture+packing tail costs two " +
       "hash exchanges + the output sort — stage boundaries are " +
       "checkpoint leaves, so the LM/dedup/DSIR work never recomputes " +
       "per downstream consumer") {
    val p = planOf("q253_curation_e2e")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 2,
      s"expected exactly the budget (_g, _mb) + packing (lang) " +
        s"exchanges:\n${p.take(2000)}")
    assert("Exchange rangepartitioning".r.findAllIn(p).length === 1,
      "expected exactly the deterministic output sort")
  }

  test("q271: the media capstone's packing tail costs one hash " +
       "exchange + the output sort — ingest/dedup/gate work sits " +
       "behind the survivor checkpoint leaf") {
    val p = planOf("q271_media_capstone")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"expected exactly the per-source packing exchange:\n${p.take(2000)}")
    assert("Exchange rangepartitioning".r.findAllIn(p).length === 1,
      "expected exactly the deterministic output sort")
  }

  test("q278: the persisted-cut APPLY side is join-free — the loaded " +
       "dictionary becomes a literal when-chain projection") {
    val p = planOf("q278_persisted_cuts")
    // the serving branch must not join the dictionary: the artifact is
    // driver-bounded, so the cut rule compiles to a projection; the
    // only joins in the WHOLE plan would be dictionary-refit internals
    // (there are none — valueRanks is window+agg)
    assert(!p.contains("Join"),
      s"cut apply should be a pure projection, found a join:\n${p.take(1500)}")
    // the serving scan prunes to the two used columns
    val scans = p.split("\n").filter(l =>
      l.contains("lineitem.parquet") && l.contains("ReadSchema"))
    assert(scans.nonEmpty && scans.forall(l =>
      !l.contains("l_quantity") && !l.contains("l_shipdate")),
      s"serving scan reads unused columns: ${scans.mkString}")
  }

  test("q281: the t-closeness grid joins broadcast the domain-bounded " +
       "sides (no row-stream re-shuffle after the first aggregate)") {
    val p = planOf("q281_t_closeness")
    assert("BroadcastExchange".r.findAllIn(p).length >= 2,
      s"sens/tot sides should broadcast:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"),
      "grid must use broadcast cross/hash joins, not a cartesian")
  }

  test("q280: the LPA readout runs over the MEMOIZED assignment (a " +
       "local relation — round-13 shared-fit, the microCents pattern " +
       "for graphs), never the 12-stage sweep-loop lineage") {
    val p = planOf("q280_label_propagation")
    assert(p.contains("LocalTableScan") || p.contains("ExistingRDD"),
      s"assignment should be the node-bounded memo leaf:\n${p.take(1200)}")
    assert("Exchange".r.findAllIn(p).length <= 2,
      s"readout re-plans the whole loop:\n${p.take(1500)}")
  }

  test("q31: minhash aggregates in a single exchange on doc_id") {
    val p = planOf("q31_minhash_sig")
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(p).length === 1,
      "minhash should shuffle once on the doc key")
  }

  test("q59: bloom filter prunes the probe BEFORE the join via the " +
       "NATIVE BloomFilterMightContain (no codegen-breaking UDF)") {
    val p = planOf("q59_bloom_join")
    assert(p.contains("might_contain"),
      s"native bloom probe filter missing:\n${p.take(1500)}")
    assert(!p.contains("UDF"),
      s"bloom probe regressed to an opaque Scala UDF:\n${p.take(1500)}")
    assert(p.contains("HashJoin"), "bloom-pruned join lost its hash join")
  }

  test("q12/q13/q62: quantile plans run the percentile_approx sketch — " +
       "no exact-percentile buffer of every value") {
    for (q <- Seq("q12_median_impute", "q13_percentiles",
        "q62_iqr_outliers")) {
      val p = planOf(q)
      assert(!"percentile\\((?!_approx)".r.findFirstIn(p).isDefined &&
        !p.contains("median("),
        s"$q still buffers exact percentiles:\n${p.take(1200)}")
    }
  }

  test("q63: centroid aggregation is partial+final (map-side combine " +
       "keeps the shuffle at groups x dims)") {
    val p = planOf("q63_label_centroids")
    assert("HashAggregate.*partial_avg".r.findFirstIn(p).isDefined ||
      "partial".r.findFirstIn(p).isDefined,
      s"no partial aggregate before the exchange:\n${p.take(1500)}")
    assert("Exchange hashpartitioning\\(label".r.findAllIn(p).length === 1,
      "centroids should shuffle once on (label, pos)")
  }

  test("q58: BM25 statistics and term frequencies broadcast to the " +
       "scorers (no shuffle join on the postings)") {
    val p = planOf("q58_bm25_search")
    assert("BroadcastHashJoin|BroadcastNestedLoopJoin".r
      .findAllIn(p).length >= 2,
      s"df/stats should broadcast, not shuffle:\n${p.take(1500)}")
    assert(p.contains("TakeOrderedAndProject"),
      "BM25 top-k should plan as a heap, not a global sort")
  }

  test("q68: heavy hitters partial-aggregate before the vocabulary " +
       "shuffle and top-k as a heap") {
    val p = planOf("q68_heavy_hitters")
    // map-side combine: a partial HashAggregate must sit below the
    // term-keyed exchange, so the shuffle carries (term, partial count)
    assert("Exchange hashpartitioning\\(term".r.findFirstIn(p).isDefined,
      s"expected a term-keyed exchange:\n${p.take(1500)}")
    assert("partial_count|partial".r.findFirstIn(
      p.substring(p.indexOf("Exchange hashpartitioning(term"))).isDefined ||
      "HashAggregate".r.findAllIn(p).length >= 2,
      "no partial aggregate before the term shuffle")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k terms should plan as a heap, not a global sort")
  }

  test("q72: dedup-against anti-joins on the digest, reading only the " +
       "dedup columns from the reference side") {
    val p = planOf("q72_dedup_against")
    assert(p.contains("LeftAnti"), p.take(1200))
    // the reference scan needs text (to hash) and nothing else
    val refScans = p.split("\n").filter(l =>
      l.contains("documents.parquet") && l.contains("ReadSchema"))
    assert(refScans.exists(_.contains("text")), "ref side must read text")
    assert(!refScans.exists(_.contains("lang")),
      s"ref scan reads unused columns: ${refScans.mkString}")
  }

  test("q73: contamination collapses the train side to its distinct " +
       "shingle vocabulary before the join") {
    val p = planOf("q73_decontaminate")
    // the train-side distinct is a (partial, final) aggregate pair below
    // the shingle equi-join — the join input is the vocabulary, not the
    // exploded corpus
    assert("HashAggregate".r.findAllIn(p).length >= 3,
      s"train-side distinct aggregate missing:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "contamination must stay an equi-join on the shingle")
  }

  test("q75: sequence packing costs ONE exchange on the group key " +
       "(cumsum is a frame-bounded window, no self-join)") {
    val p = planOf("q75_sequence_packing")
    assert("Exchange hashpartitioning\\(lang".r.findAllIn(p).length === 1,
      s"packing should shuffle once on lang:\n${p.take(1500)}")
    assert(!p.contains("Join"), "packing must not plan a self-join")
  }

  test("q76: mixture rank window partitions on (group, md5-bucket) — " +
       "no single-task-per-group window") {
    val p = planOf("q76_source_mixture")
    assert("Exchange hashpartitioning\\(lang#\\d+, _mb".r
      .findFirstIn(p).isDefined,
      s"rank window should partition on (lang, _mb):\n${p.take(1500)}")
    // the quota table joins as a broadcast, not a shuffle
    assert(p.contains("BroadcastHashJoin"),
      "quota table should broadcast onto the scan")
  }

  test("q39/q38: the two-projection pattern holds — exactly ONE regex " +
       "tokenization in each plan (CollapseProject must keep the " +
       "multiply-referenced token array materialized)") {
    val p39 = planOf("q39_lang_id")
    assert("split\\(".r.findAllIn(p39).length === 1,
      s"q39 re-tokenizes per marker probe:\n${p39.take(1200)}")
    val p38 = planOf("q38_text_quality")
    assert("split\\(".r.findAllIn(p38).length === 1,
      s"q38 re-tokenizes per signal:\n${p38.take(1200)}")
  }

  test("q124: bigram statistics tokenize ONCE — the checkpointed pair " +
       "table feeds both consumers, zero Generate nodes downstream, " +
       "and no window for the first-token totals") {
    val p = planOf("q124_bigram_stats")
    assert(!p.contains("Generate"),
      s"q124 re-tokenizes a consumer of the pair table:\n${p.take(1500)}")
    assert(p.contains("Scan ExistingRDD"),
      s"expected the localCheckpoint leaf under both consumers:\n" +
        p.take(1500))
    assert(!p.contains("Window"),
      s"first-token totals must be an aggregate, not a window:\n" +
        p.take(1500))
  }

  test("q128: the corpus tokenizes ONCE — the checkpointed unigram LM " +
       "feeds both the probability join and the total-token count, so " +
       "the only Generate left is the scored subset's explode") {
    val p = planOf("q128_unigram_surprisal")
    assert("Generate".r.findAllIn(p).length === 1,
      s"q128 re-tokenizes the corpus for the total count:\n${p.take(1500)}")
    assert(p.contains("Scan ExistingRDD"),
      s"expected the localCheckpoint leaf under both LM consumers:\n" +
        p.take(1500))
  }

  test("q129: equi-depth binning windows the distinct-value HISTOGRAM " +
       "only — one Window, fed by a map-side-combinable aggregate, " +
       "never a data-sized ntile sort or a crossJoin'd total") {
    val p = planOf("q129_equidepth_bins")
    assert("Window".r.findAllIn(p).length === 1,
      s"running count and grand total must share one Window:\n${p.take(1500)}")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"histogram must partial-aggregate before the exchange:\n${p.take(1500)}")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"no crossJoin'd total aggregate:\n${p.take(1500)}")
  }

  test("q130: melt fans out inside the scan stage — ONE parquet scan " +
       "feeding an Expand, never a per-metric union of 4 scans") {
    val p = planOf("q130_melt")
    assert(p.contains("Expand"), s"melt must plan as Expand:\n${p.take(1500)}")
    assert("Scan parquet".r.findAllIn(p).length === 1,
      s"melt re-scans the table per metric:\n${p.take(1500)}")
    assert(!p.contains("Union"),
      s"melt degraded to a union of scans:\n${p.take(1500)}")
  }

  test("q126: snapshot diff is ONE full-outer equi-join over two " +
       "map-side-compacted snapshots — no rank window") {
    val p = planOf("q126_table_diff")
    assert(p.contains("FullOuter"), s"expected full-outer:\n${p.take(1500)}")
    assert(!p.contains("Window"),
      s"snapshots must compact via max_by aggregate:\n${p.take(1500)}")
  }

  test("q119/saltedJoin: with broadcast off, both sides exchange on " +
       "(key, salt) — the hot key spreads across factor reducers") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      val left = (0L until 512L).map(i => (if (i % 4 == 0) "hot" else s"k$i",
        i)).toDF("k", "v")
      val right = Seq(("hot", 1.0), ("k1", 2.0)).toDF("k", "w")
      val p = graft.ops.RelOps.saltedJoin(left, right, "k", factor = 8)
        .queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning\\(k#\\d+, _salt#\\d+".r
        .findFirstIn(p).isDefined,
        s"join must key on (k, _salt):\n${p.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q106: the token table materializes ONCE — the co-occurrence " +
       "plan reads the checkpointed tokens, zero Generate/explode " +
       "nodes left (tokenization is the dominant cost at scale)") {
    val p = planOf("q106_cooccurrence")
    assert(!p.contains("Generate"),
      s"q106 re-tokenizes a consumer of the checkpointed tokens:\n" +
        p.take(1500))
    assert(p.contains("Scan ExistingRDD"),
      s"expected the localCheckpoint leaf under both consumers:\n" +
        p.take(1500))
  }

  test("q95: range-lookup join is an EQUI-join on the coarse bucket — " +
       "never the BroadcastNestedLoopJoin a naive non-equi join plans to") {
    val p = planOf("q95_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range join degraded to an all-pairs strategy:\n${p.take(1500)}")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi-join on the bucket id:\n${p.take(1500)}")
  }

  test("q96: fuzzy join blocks on the deletion variant (equi-join), " +
       "not an all-pairs levenshtein comparison") {
    val p = planOf("q96_fuzzy_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"fuzzy join degraded to an all-pairs strategy:\n${p.take(1500)}")
    assert(p.contains("_variant"),
      s"expected the variant blocking key in the join:\n${p.take(1500)}")
  }

  test("q97: each PageRank iteration is node-keyed shuffles — no " +
       "cross-join anywhere in the unrolled plan") {
    val p = planOf("q97_pagerank")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"rank propagation must stay an equi-join on src/id:\n${p.take(1500)}")
  }

  test("q99: latest-state snapshot is one partial-aggregable max_by " +
       "pass — NO rank window, and a partial aggregate sits below the " +
       "user exchange so map-side combine reduces before the shuffle") {
    val p = planOf("q99_latest_snapshot")
    assert(!p.contains("Window"),
      s"snapshot degraded to a rank window:\n${p.take(1500)}")
    assert(p.contains("max_by"),
      s"expected the max_by aggregate:\n${p.take(1500)}")
    val ex = p.indexOf("Exchange hashpartitioning(user_id")
    assert(ex >= 0, s"expected a user_id exchange:\n${p.take(1500)}")
    assert(p.substring(ex).contains("Aggregate"),
      s"no partial aggregate below the user exchange:\n${p.take(1500)}")
  }

  test("q101: interval-overlap join is an equi-join on the bucket id " +
       "with the theta predicate as residual — no nested-loop") {
    val p = planOf("q101_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"overlap join degraded to an all-pairs strategy:\n${p.take(1500)}")
    assert(p.contains("_bkt"),
      s"expected the bucket id in the join keys:\n${p.take(1500)}")
  }

  test("q102: the funnel is user-keyed equi-joins end to end (no " +
       "cross-join, no window sort over the raw event stream)") {
    val p = planOf("q102_funnel")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"funnel stage joins must stay equi on user_id:\n${p.take(1500)}")
    assert(!p.contains("Window"),
      s"funnel must not sort per-user event sequences:\n${p.take(1500)}")
  }

  test("q104: rolling z-score costs ONE user exchange feeding a single " +
       "window sort (both window functions share the frame)") {
    val p = planOf("q104_rolling_zscore")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length === 1,
      s"rolling stats should shuffle once on user_id:\n${p.take(1500)}")
    assert("Window\\b".r.findAllIn(p).length <= 2,
      s"avg/stddev over the same frame must share windows:\n${p.take(1500)}")
  }

  test("q106: co-occurrence prunes tokens through a SEMI join on the " +
       "df-banded vocabulary before the per-doc pairing") {
    val p = planOf("q106_cooccurrence")
    assert(p.contains("LeftSemi"),
      s"vocabulary band must prune via semi-join:\n${p.take(1500)}")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"pairing must stay an equi-join on doc_id:\n${p.take(1500)}")
  }

  test("q71: salted aggregation is two exchanges — (key, salt) then key") {
    val p = planOf("q71_salted_agg")
    val exchanges = "Exchange hashpartitioning\\([^)]*\\)".r
      .findAllIn(p).toList
    val salted = exchanges.filter(_.contains("_salt"))
    val keyOnly = exchanges.filter(e =>
      e.contains("event_type") && !e.contains("_salt"))
    // exactly one (key, salt) exchange and one key-only exchange — the
    // earlier regex ([^_] after event_type) matched the attribute-id '#'
    // of BOTH exchanges and could never fail (round-3 ADVICE)
    assert(salted.length === 1,
      s"stage-1 exchange should key on (event_type, _salt): $exchanges")
    assert(keyOnly.length === 1,
      s"stage-2 exchange should key on event_type alone: $exchanges")
  }

  test("q140: the row_number()<=k sample plans a WindowGroupLimit — " +
       "each map task forwards at most k rows per group into the " +
       "exchange, so the shuffle never moves the corpus") {
    val p = planOf("q140_exactk_sample")
    assert(p.contains("WindowGroupLimit"),
      s"rank filter not pushed to a group limit:\n${p.take(1500)}")
  }

  test("q141: vocab + OOV tokenize ONCE — the checkpointed doc-term " +
       "matrix feeds both the vocab aggregate and the scorer, zero " +
       "Generate downstream, vocab side broadcast") {
    val p = planOf("q141_vocab_oov")
    assert(!p.contains("Generate"),
      s"q141 re-tokenizes a consumer of the doc-term matrix:\n" +
        p.take(1500))
    assert(p.contains("Scan ExistingRDD"),
      s"expected the localCheckpoint leaf under both consumers:\n" +
        p.take(1500))
    assert(p.contains("BroadcastHashJoin"),
      s"the 150-row vocab must broadcast:\n${p.take(1500)}")
  }

  test("q144: MAD report's final plan reads only the checkpointed " +
       "histograms — the two inherent raw passes ran at construction, " +
       "the outlier count never re-scans parquet") {
    val p = planOf("q144_mad_outliers")
    assert(!p.contains("Scan parquet"),
      s"q144 re-reads raw rows past the two inherent passes:\n" +
        p.take(1500))
    assert(p.contains("Scan ExistingRDD"),
      s"expected the localCheckpoint leaves:\n${p.take(1500)}")
  }

  test("q145: the skew report is two map-side-combinable aggregates " +
       "and a broadcast — no window over the per-key counts") {
    val p = planOf("q145_key_skew")
    assert(!p.contains("Window"),
      s"skew stats must not sort per-key counts in a window:\n" +
        p.take(1500))
    assert(p.contains("BroadcastHashJoin"),
      s"the G-row totals must broadcast:\n${p.take(1500)}")
  }

  test("q146: Q5's scale-independent invariants — the date filter " +
       "reaches the orders scan, the region filter its scan, the fact " +
       "scan prunes to 4 of 11 columns, no join degenerates to a " +
       "nested loop") {
    val p = planOf("q146_tpch_q5")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"date range not pushed to the orders scan:\n${p.take(2000)}")
    assert(p.contains("EqualTo(r_name,ASIA)"),
      s"region filter not pushed:\n${p.take(2000)}")
    val factRead = "ReadSchema: struct<l_[^\n]*".r.findFirstIn(p).get
    assert(factRead.count(_ == ',') == 3,
      s"fact scan must read exactly 4 lineitem columns: $factRead")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"the cyclic join must stay hash equi-joins:\n${p.take(2000)}")
  }

  test("q148: Pareto coverage windows the count-of-COUNTS only — the " +
       "per-key table is never sorted (no rank over every key)") {
    val p = planOf("q148_pareto")
    // the window sorts order the LEVEL histogram (event_type, _c) —
    // a per-key rank would need a Sort whose ordering carries user_id
    assert(!"Sort \\[[^\n]*user_id".r.findFirstIn(p).isDefined,
      s"per-key table must never be sorted:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"),
      s"no cross join in the coverage report:\n${p.take(1500)}")
  }

  test("q167: the A-ES weighted top-k plans as TakeOrderedAndProject " +
       "— a bounded per-partition heap, never a global sort") {
    val p = planOf("q167_weighted_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q171: the Welch t-test is ONE conditional-aggregate pass — " +
       "no join, no second events scan") {
    val p = planOf("q171_welch_ttest")
    assert(!p.contains("Join"),
      s"both arms must come from one pass:\n${p.take(1500)}")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"events must be scanned once:\n${p.take(1500)}")
  }

  test("q174: the probe side of the record-linkage join broadcasts") {
    val p = planOf("q174_record_linkage")
    assert(p.contains("BroadcastHashJoin"),
      s"record linkage must broadcast the probe batch:\n${p.take(1500)}")
  }

  test("q175: the item-pair generation is a keyed equi-join (user_id) " +
       "— never a cartesian — and the < predicate rides the join") {
    val p = planOf("q175_item_similarity")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"pair generation must key on user_id:\n${p.take(1500)}")
  }

  test("q170: max_by argmax is ONE partially-aggregable pass — a " +
       "partial HashAggregate below the group exchange, no window " +
       "sort over the orders table") {
    val p = planOf("q170_argmax_latest")
    assert("partial_max_by|HashAggregate[^\n]*partial".r
      .findFirstIn(p).isDefined,
      s"argmax must map-side combine:\n${p.take(1500)}")
    assert(!p.contains("Window"),
      s"argmax must not fall back to a row_number window:\n${p.take(1500)}")
  }

  test("q386/q389: the lag-join stages equi-join on the shifted grid " +
       "key — never a cartesian (quadratic at a real grid). The pin " +
       "inspects the ops' OWN pre-checkpoint builders (arPredFrame / " +
       "seasonalNaivePredFrame), so a regression in the real join " +
       "construction trips it (round-16 advice)") {
    import org.apache.spark.sql.functions._
    val base = spark.range(1, 200).select(col("id").as("_t"),
      (col("id") % 7).as("_x"))
    Seq(
      "arPredFrame" ->
        graft.ops.AggOps.arPredFrame(base, order = 5),
      "seasonalNaivePredFrame" ->
        graft.ops.AggOps.seasonalNaivePredFrame(base, period = 7),
      // round-18: the HR stage-2 frame's p+q lag joins must keep
      // the same shifted-key equi-join shape
      "armaRegFrame" ->
        graft.ops.AggOps.armaRegFrame(base, p = 2, q = 1, longAr = 5)
    ).foreach { case (name, frame) =>
      val p = frame.queryExecution.executedPlan.toString
      // the ops DELIBERATELY cross-join broadcast 1-row frames (phi,
      // mean) — those plan as `BroadcastNestedLoopJoin ... Cross` and
      // are fine; what must never appear is the LAG join degraded to
      // a non-equi nested loop (Inner BNLJ with the shifted-key
      // condition) or a cartesian
      assert(!p.contains("CartesianProduct"),
        s"$name: shifted-key join degraded to a cartesian:\n" +
          p.take(1500))
      assert(!"BroadcastNestedLoopJoin[^\n]*Inner".r
        .findFirstIn(p).isDefined,
        s"$name: shifted-key join degraded to a nested loop:\n" +
          p.take(1500))
      assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
        s"$name: shifted-key join must be an equi-join:\n" +
          p.take(1500))
    }
  }
}
