package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SearchOps, TextOps}

/** Round-9 operator units: BPE merge-pair training statistics. The
  * oracled q190 carries the DuckDB replay; these pin the hand-checkable
  * semantics — frequency weighting, the lexicographic tie-break,
  * merged symbols feeding later rounds, leftmost-greedy run handling,
  * and early exhaustion. */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def merges(vocab: Seq[(String, Long)], k: Int) =
    TextOps.bpeMerges(vocab.toDF("w", "f"), "w", "f", k)
      .orderBy(col("round"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))

  test("bpeMerges: weighting, lexicographic tie-break, merged symbols " +
       "in later rounds, early exhaustion before k") {
    // round 1: (a,a)=2·2=4 vs (a,b)=2·1+3·1=5 → (a,b)
    // round 2: aaab→[a,a,ab]: (a,a)=2, (a,ab)=2 — tie → (a,a) (lex)
    // round 3: aaab→[aa,ab]: (aa,ab)=2
    // round 4: all words single-symbol → exhausted (3 rows, not 6)
    val got = merges(Seq(("aaab", 2L), ("ab", 3L)), k = 6)
    assert(got === Array(
      (1L, "a", "b", 5L),
      (2L, "a", "a", 2L),
      (3L, "aa", "ab", 2L)))
  }

  test("bpeMerges: run counts include overlaps, application is " +
       "leftmost-greedy non-overlapping") {
    // 'aaaa': round 1 counts (a,a) at every adjacency (3 — the
    // standard BPE count), but the merge applies non-overlapping
    // leftmost → [aa, aa], so round 2 sees exactly one (aa,aa) pair
    val got = merges(Seq(("aaaa", 1L)), k = 3)
    assert(got === Array(
      (1L, "a", "a", 3L),
      (2L, "aa", "aa", 1L)))
  }

  test("bpeMerges: odd run leaves the tail symbol unmerged") {
    // 'aaa' → [aa, a]; round 2 merges (aa, a) — order of the pair
    // preserves sequence position, not lexicographic symbol order
    val got = merges(Seq(("aaa", 1L)), k = 2)
    assert(got === Array(
      (1L, "a", "a", 2L),
      (2L, "aa", "a", 1L)))
  }

  test("bpeEncode applies merges in training order; symbols " +
       "concatenate back to the word") {
    val words = Seq("servers", "verse", "x").toDF("w")
    val got = TextOps.bpeEncode(words, "w",
        Seq(("e", "r"), ("er", "s")))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
    // servers: s,e,r,v,e,r,s → (e,r) → s,er,v,er,s → (er,s) → s,er,v,ers
    assert(got("servers") === (("s er v ers", 4L)))
    // verse: v,e,r,s,e → (e,r) → v,er,s,e → (er,s) → v,ers,e
    assert(got("verse") === (("v ers e", 3L)))
    assert(got("x") === (("x", 1L)))
    // reconstruction: symbols concatenate back to the original word
    got.foreach { case (w, (enc, _)) =>
      assert(enc.replace(" ", "") === w)
    }
  }

  test("rrfFuse: integer micro-unit contributions, absent-list items " +
       "score from present lists only") {
    val l1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val l2 = Seq((20L, 1), (10L, 2)).toDF("id", "rank")
    val got = SearchOps.rrfFuse(Seq(l1, l2), "id", "rank", k0 = 60)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    def c(rank: Int) = math.round(1e9 / (60 + rank))
    assert(got === Map(
      10L -> ((2L, c(1) + c(2))),
      20L -> ((2L, c(2) + c(1))),
      30L -> ((1L, c(3)))))
    // symmetric ranks fuse identically — order-free by construction
    assert(got(10L)._2 === got(20L)._2)
  }

  test("q191 composition invariants: components partition the corpus, " +
       "kept member is a member, best_score is its group's max") {
    val got = SparkEntry.queries("q191_semdedup_canonical")(
      spark, "/root/testdata/sf0.001")
    val rows = got.collect()
    // groups partition the 500 vectors
    assert(rows.map(_.getLong(3)).sum === 500L)
    // the kept member leads its own component label ordering: comp is
    // the group's minimum id, so keep_id >= comp, and a singleton
    // keeps itself
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(0))
      if (r.getLong(3) == 1L) assert(r.getLong(1) === r.getLong(0))
    }
  }

  test("bigramLmScore: hand-computed add-one smoothing, unseen bigram " +
       "and unseen first token fall out of the coalesced formula") {
    // train 'a b a b': pairs (a,b)=2, (b,a)=1; firsts a=2, b=1; V=2
    // held 'a b c': (a,b) p=(2+1)/(2+2)=0.75; (b,c) p=(0+1)/(1+2)=1/3
    // held 'z q':   (z,q) p=(0+1)/(0+2)=0.5  (first token unseen)
    val train = Seq("a b a b").toDF("text")
    val held = Seq((1L, "a b c"), (2L, "z q"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextOps.bigramLmScore(train, held, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def micro(p: Double) = math.round(math.log(p) * 1e6)
    val d1 = micro(0.75) + micro(1.0 / 3.0)
    val nll1 = BigDecimal(-d1.toDouble / 1e6 / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((2L, d1, nll1)))
    assert(got(2L) === ((1L, micro(0.5), 0.693147)))
    // a 1-token doc has no bigrams and is absent, not NaN
    assert(!got.contains(3L))
  }

  test("cTfIdfTopTerms: hand-computed weights, cluster-concentrated " +
       "terms outrank common ones, (weight, token) tie-break") {
    // cluster 0: 'x x y'; cluster 1: 'y z'
    // tf: (0,x)=2 (0,y)=1 (1,y)=1 (1,z)=1; f: x=2 y=2 z=1; A=5/2
    val docs = Seq((0L, "x x y"), (1L, "y z")).toDF("cluster", "text")
    val got = TextOps.cTfIdfTopTerms(docs, "cluster", "text", 2)
      .orderBy(col("cluster"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    def w(tf: Long, f: Long) =
      math.round(tf * math.log(1.0 + 2.5 / f) * 1e6)
    assert(got === Array(
      (0L, 1L, "x", 2L, w(2, 2)),
      (0L, 2L, "y", 1L, w(1, 2)),
      (1L, 1L, "z", 1L, w(1, 1)), // rarer z beats shared y
      (1L, 2L, "y", 1L, w(1, 2))))
  }

  test("kAnonymize: small QI groups suppress every QI cell, large " +
       "groups pass through, non-QI columns untouched") {
    val df = Seq((1L, "a", 10L), (2L, "a", 11L), (3L, "a", 12L),
      (4L, "b", 13L)).toDF("qi", "seg", "id")
      .select(col("qi"), col("seg"), col("id"))
    val got = graft.ops.CleanOps.kAnonymize(
        df.select(col("qi").cast("long").as("qi"), col("seg"), col("id")),
        Seq("qi", "seg"), k = 3)
      .orderBy(col("id")).collect()
    // every (qi, seg) tuple is a singleton → all suppressed, QI null
    got.foreach { r =>
      assert(r.getBoolean(3)); assert(r.isNullAt(0)); assert(r.isNullAt(1))
    }
    val big = Seq((9L, "x", 1L), (9L, "x", 2L), (9L, "x", 3L))
      .toDF("qi", "seg", "id")
    val kept = graft.ops.CleanOps.kAnonymize(big, Seq("qi", "seg"), 3)
      .orderBy(col("id")).collect()
    kept.foreach { r =>
      assert(!r.getBoolean(3)); assert(r.getLong(0) === 9L)
      assert(r.getString(1) === "x")
    }
  }

  test("compactionPlan: bins cut at target multiples of the running " +
       "total, reset per partition, remainder bin kept") {
    val inv = Seq(("p1", 1L, 60L), ("p1", 2L, 50L), ("p1", 3L, 50L),
      ("p1", 4L, 10L), ("p2", 1L, 5L))
      .toDF("part", "file_id", "bytes")
    val got = graft.ops.LayoutOps
      .compactionPlan(inv, "part", "file_id", "bytes", 100L)
      .orderBy(col("part"), col("bin"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // p1: cum-before 0,60,110,160 → bins 0,0,1,1; p2 resets to bin 0
    assert(got === Array(
      ("p1", 0L, 2L, 110L, 1L, 2L),
      ("p1", 1L, 2L, 60L, 3L, 4L),
      ("p2", 0L, 1L, 5L, 1L, 1L)))
  }

  test("fellegiSunter: integer weight sum, threshold classification, " +
       "per-field agreement flags surface") {
    val pairs = Seq((1L, 2L, "x", "x", 10L, 11L),
      (3L, 4L, "x", "y", 10L, 50L)).toDF(
      "key_a", "key_b", "f1_a", "f1_b", "f2_a", "f2_b")
    val got = graft.ops.RelOps.fellegiSunter(pairs, Seq(
        ("f1", col("f1_a") === col("f1_b"), 2000000L, -1000000L),
        ("f2", abs(col("f2_a") - col("f2_b")) <= 2, 1000000L, -500000L)),
      matchAtLeast = 3000000L, nonMatchAtMost = -1000000L)
      .orderBy(col("key_a"))
      .collect().map(r => (r.getAs[Boolean]("agr_f1"),
        r.getAs[Boolean]("agr_f2"), r.getAs[Long]("score_micro"),
        r.getAs[String]("decision")))
    assert(got === Array(
      (true, true, 3000000L, "match"),
      (false, false, -1500000L, "non_match")))
  }

  test("misra_gries: capacity >= distinct items is the exact count " +
       "table under any partitioning") {
    val items = Seq.tabulate(300)(i => s"t${i % 7}")
    for (parts <- Seq(1, 4, 13)) {
      val got = items.toDF("w").repartition(parts)
        .agg(graft.functions.GraftFunctions.misra_gries(col("w"), 10)
          .as("mg"))
        .select(explode(col("mg")).as("e"))
        .select(col("e.item"), col("e.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
      assert(got === exact.toMap)
    }
  }

  test("misra_gries: eviction regime keeps the underestimate-within-" +
       "n/(k+1) and heavy-item-presence guarantees under any split") {
    // skewed stream: 'hot' 500, 'warm' 120, 60 singletons (n = 680)
    val items = Seq.fill(500)("hot") ++ Seq.fill(120)("warm") ++
      (0 until 60).map(i => s"cold$i")
    val n = items.size.toLong
    val cap = 5
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
    for (parts <- Seq(1, 3, 8)) {
      val got = items.toDF("w").repartition(parts)
        .agg(graft.functions.GraftFunctions.misra_gries(col("w"), cap)
          .as("mg"))
        .select(explode(col("mg")).as("e"))
        .select(col("e.item"), col("e.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= cap)
      got.foreach { case (item, est) =>
        val truth = exact(item)
        assert(est <= truth, s"$item overestimated")
        assert(truth - est <= n / (cap + 1), s"$item error bound")
      }
      // anything with true count > n/(cap+1) must be present
      exact.filter(_._2 > n / (cap + 1)).keys.foreach { heavy =>
        assert(got.contains(heavy), s"$heavy missing at parts=$parts")
      }
    }
  }

  test("aHash32: hand-computed grid/threshold/pack; identical " +
       "payloads hash equal") {
    val df = Seq((1L, "ab"), (2L, "ab"), (3L, "ba")).toDF("id", "text")
    val got = graft.ops.MultimodalOps.aHash32(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "ab": cells {0: 'a'=97, 16: 'b'=98}, mean 97.5 → only cell 16
    // clears the threshold
    assert(got(1L) === (1L << 16))
    assert(got(2L) === got(1L)) // identical payload ⇒ Hamming 0
    assert(got(3L) === 1L)      // "ba": cell 0 is the bright one
  }

  test("pmiCollocations: hand-computed PMI, positional first/second " +
       "marginals, min-count screen") {
    // tokens 'a b a b c b': bigrams (a,b)x2 (b,a) (b,c) (c,b); N=5
    // firsts: a=2 b=2 c=1; seconds: b=3 a=1 c=1
    val docs = Seq("a b a b c b").toDF("text")
    val got = TextOps.pmiCollocations(docs, "text", minCount = 2L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // only (a,b) clears minCount; PMI = ln(2·5 / (2·3))
    assert(got.keySet === Set(("a", "b")))
    assert(got(("a", "b")) ===
      ((2L, math.round(math.log(10.0 / 6.0) * 1e6))))
  }

  test("olsTrend: exact line recovered, noisy fit hand-checked, " +
       "degenerate groups dropped") {
    val pts = Seq(("a", 0L, 0L), ("a", 1L, 2L), ("a", 2L, 4L),
      ("b", 0L, 1L), ("b", 1L, 1L), ("b", 2L, 3L),
      ("c", 5L, 1L), ("c", 5L, 9L)).toDF("g", "x", "y")
    val got = graft.ops.AggOps.olsTrend(pts, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("a") === ((3L, 2.0, 0.0)))
    // b: n=3 sx=3 sy=5 sxx=5 sxy=7 → slope (21-15)/(15-9)=1,
    // intercept (5-3)/3
    assert(got("b") === ((3L, 1.0, 0.666667)))
    assert(!got.contains("c")) // single distinct x — no slope
  }

  test("neymanSample: bigger-and-noisier strata get more draws, " +
       "per-stratum counts equal the exact-integer allocation") {
    // stratum p: 40 rows, y spread 0..390; stratum q: 40 rows, y
    // constant → w_q = 0 → everything goes to p
    val rows = (0 until 40).map(i => ("p", i.toLong, i * 10L)) ++
      (0 until 40).map(i => ("q", 100L + i, 7L))
    val df = rows.toDF("src", "id", "y")
    val got = graft.ops.SplitOps
      .neymanSample(df, "src", "id", col("y"), totalN = 20L, salt = "t")
      .groupBy(col("src")).agg(count(lit(1)).as("n"),
        first(col("alloc_n")).as("alloc"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("p") === ((20L, 20L)))
    assert(!got.contains("q")) // zero-variance stratum draws nothing
  }

  test("gramMatrix: hand-computed upper triangle in micro-units, " +
       "partition-invariant exact reduction") {
    val vecs = Seq(Array(1.0, 2.0), Array(3.0, 4.0))
    for (parts <- Seq(1, 2)) {
      val got = graft.ops.SimilarityOps.gramMatrix(
          vecs.toDF("embedding").repartition(parts), "embedding", dim = 2)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
        .toMap
      assert(got === Map((0, 0) -> 10000000L, (0, 1) -> 14000000L,
        (1, 1) -> 20000000L))
    }
  }

  test("powerIterationMicro: converges onto the dominant axis in " +
       "exact integers, off-axis mass decays monotonically") {
    // G = diag(2, 1) in micro-units: dominant eigenvector = e0
    val g = Array(Array(2000000L, 0L), Array(0L, 1000000L))
    var prev = BigInt(1000000)
    for (k <- 1 to 8) {
      val v = graft.ops.SimilarityOps.powerIterationMicro(g, k)
      assert(v(0) === BigInt(1000000)) // dominant axis pegged at scale
      assert(v(1) < prev)              // off-axis halves each round
      prev = v(1)
    }
    assert(graft.ops.SimilarityOps.powerIterationMicro(g, 8)(1)
      === BigInt(1000000) / BigInt(256))
  }

  test("phraseSearch: consecutive positions only, repeated terms " +
       "chain correctly, occurrences counted per doc") {
    val docs = Seq(
      (1L, "a b c a b"),   // 'a b' twice; adjacency pairs ab bc ca ab
      (2L, "b a"),          // reversed — no 'a b'
      (3L, "a x b"),        // gap — no match
      (4L, "a a a")).toDF("id", "text")
    def hits(p: String*) = SearchOps
      .phraseSearch(docs, "id", "text", p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits("a", "b") === Map(1L -> 2L))
    assert(hits("b", "a") === Map(2L -> 1L))
    assert(hits("c", "a", "b") === Map(1L -> 1L))
    assert(hits("a", "a", "a") === Map(4L -> 1L))
  }

  test("bpeMerges: multi-char symbols never merge mid-symbol") {
    // after (l,o)→lo, word 'lol' = [lo, l]; a naive string scan could
    // find 'o l' inside 'lo l' — the boundary encoding must not
    val got = merges(Seq(("lol", 4L), ("lo", 1L), ("ol", 1L)), k = 2)
    // round 1: (l,o)=4+1=5, (o,l)=4+1=5 — tie → (l,o)
    assert(got(0) === ((1L, "l", "o", 5L)))
    // round 2 candidates: 'lol'→[lo,l] gives (lo,l)=4; 'ol' gives
    // (o,l)=1 — the 'o l' inside [lo, l] must NOT count
    assert(got(1) === ((2L, "lo", "l", 4L)))
  }
}
