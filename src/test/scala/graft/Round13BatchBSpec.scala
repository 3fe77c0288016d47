package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, EvalOps, GraphOps, SketchOps, TextOps}

/** Batch-B operators of round 13: relational Bloom filter, grouped
  * FM cardinality, Good–Turing smoothing, HITS, one-pass ridge by
  * Cramer's rule, paired permutation test, and the streaming FM
  * window's state bound. Hand-computed fixtures + the algebraic
  * identities each operator's guarantee rests on. */
class Round13BatchBSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------- Bloom ----------------

  test("bloom: NO FALSE NEGATIVES — every inserted key probes " +
       "maybe=true, on any partitioning; an empty filter rejects " +
       "everything") {
    val members = (1L to 300L).map(i => i * 3).toDF("k")
    val bits = SketchOps.bloomBitTable(members.repartition(7), "k",
      3, 1024)
    val probed = SketchOps.bloomProbe(bits, members, "k", 3, 1024)
      .collect()
    assert(probed.length === 300 && probed.forall(_.getBoolean(1)))
    // bit table is bounded and duplicate-free
    val nb = bits.count()
    assert(nb <= 900L && nb <= 1024L &&
      nb === bits.distinct().count())
    // partition invariance of the filter itself
    val bits1 = SketchOps.bloomBitTable(members.repartition(1), "k",
      3, 1024).orderBy("bit").collect().toSeq
    assert(bits1 === bits.orderBy("bit").collect().toSeq)
    val empty = SketchOps.bloomBitTable(members.limit(0), "k", 3, 1024)
    val rej = SketchOps.bloomProbe(empty, members, "k", 3, 1024)
      .collect()
    assert(rej.length === 300 && rej.forall(!_.getBoolean(1)))
  }

  test("bloom: a non-member passes only by collision — measured FPR " +
       "on a disjoint probe set sits far below 1 for a lightly " +
       "loaded filter") {
    val members = (1L to 200L).map(_ * 2).toDF("k") // even keys
    val bits = SketchOps.bloomBitTable(members, "k", 3, 4096)
    val probes = (1L to 200L).map(_ * 2 + 1).toDF("k") // odd keys
    val fp = SketchOps.bloomProbe(bits, probes, "k", 3, 4096)
      .where(col("maybe")).count()
    // expected FPR ~ (600/4096)^3 ~ 0.3% — allow generous slack
    assert(fp <= 20L, s"implausible false-positive count $fp/200")
  }

  // ---------------- grouped FM ----------------

  test("fmCardinalityBy: per-group sketch equals running the global " +
       "sketch on each group alone, and duplicates never move it") {
    val df = (1 to 500).map(i => (s"g${i % 3}", s"item${i % 40}"))
      .toDF("g", "item")
    val grouped = SketchOps.fmCardinalityBy(
        df.unionAll(df).repartition(9), "g", "item", 16)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val solo = (0 to 2).map { g =>
      val one = SketchOps.fmCardinality(
        df.where(col("g") === s"g$g"), "item", 16)
        .agg(first(col("sum_r")), first(col("ll_est_micro"))).head()
      (s"g$g", one.getLong(0), one.getLong(1))
    }
    assert(grouped.toSeq === solo)
  }

  // ---------------- Good–Turing ----------------

  test("goodTuring: hand-computed count-of-counts fixture — levels, " +
       "r*, and the unseen mass P0 = N1/N") {
    // tokens: a a a | b b | c c | d  => N_1=1, N_2=2, N_3=1, N=8
    val docs = Seq((1L, "a a a b b"), (2L, "c c d")).toDF("id", "text")
    val out = TextOps.goodTuring(docs, "text").orderBy("r").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // r=1: r* = 2 * N_2/N_1 = 4.0; r=2: r* = 3 * N_3/N_2 = 1.5;
    // r=3: N_4 = 0 => raw-GT zero row (the pinned gap)
    assert(out.toSeq === Seq(
      (1L, 1L, 4000000L, 8L, 125000L),
      (2L, 2L, 1500000L, 8L, 125000L),
      (3L, 1L, 0L, 8L, 125000L)))
  }

  test("goodTuring: the GT mass identity Σ N_r·r* = N − N_1 holds " +
       "on a GAP-FREE level set (each (r+1)·N_{r+1} term rides row r, " +
       "so the telescoping needs contiguous levels — the reason raw " +
       "GT gaps are pinned in the output), and the real corpus's " +
       "levels replay an independent recount") {
    // zipf-ish fixture: levels 1..4 all occupied
    val docs = Seq((1L,
      "a a a a b b b c c c d d e e f g h i")).toDF("id", "text")
    val rows = TextOps.goodTuring(docs, "text").orderBy("r").collect()
    val n = rows.head.getLong(3)
    val n1 = rows.find(_.getLong(0) == 1L).map(_.getLong(1)).get
    val mass = rows.map(r => r.getLong(1).toDouble *
      r.getLong(2).toDouble / 1e6).sum
    assert(math.abs(mass - (n - n1)) < 1e-6,
      s"GT mass $mass != ${n - n1}")
    // real corpus: levels + totals replay an independent token count
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextOps.goodTuring(corpus, "text").collect()
    val recount = corpus.select(explode(TextOps.tokens(
        lower(col("text")))).as("w"))
      .groupBy("w").count().groupBy(col("count").as("r"))
      .agg(count(lit(1)).as("n_r")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap === recount)
    val nTok = recount.map { case (r, nr) => r * nr }.sum
    assert(out.head.getLong(3) === nTok)
    assert(out.head.getLong(4) === math.round(
      recount.getOrElse(1L, 0L).toDouble / nTok * 1e6))
  }

  // ---------------- HITS ----------------

  test("hits: star digraph hand-check — sources are the hubs, the " +
       "sink is the authority, and L-inf normalization pins the max " +
       "to exactly 1e6") {
    val e = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = GraphOps.hits(e, iterations = 2).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // round 1: h'(1)=h'(2)=a0(3)=1e6, h'(3)=a0(4)=1e6 -> all hubs 1e6
    // a'(3)=h(1)+h(2)=2e6 -> 1e6; a'(4)=h(3)=1e6 -> 5e5
    // round 2: h'(1)=h'(2)=a(3)=1e6 -> 1e6; h'(3)=a(4)=5e5 -> 5e5
    // a'(3)=h(1)+h(2)=2e6 -> 1e6; a'(4)=h(3)=5e5 -> 25e4
    assert(out === Seq((1L, 1000000L, 0L), (2L, 1000000L, 0L),
      (3L, 500000L, 1000000L), (4L, 0L, 250000L)))
  }

  test("hits: partition-invariant and duplicate-edge-invariant " +
       "(DISTINCT edges are the pinned semantics); every round's max " +
       "score is exactly 1e6") {
    val base = (1 to 120).map(i =>
      ((i % 13).toLong, (i % 7 + 13).toLong)).toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      GraphOps.hits(df, iterations = 3).orderBy("id").collect().toSeq
    val a = run(base.repartition(1))
    assert(a === run(base.unionAll(base).repartition(11)))
    val hubs = a.map(_.getLong(1)); val auths = a.map(_.getLong(2))
    assert(hubs.max === 1000000L && auths.max === 1000000L)
  }

  // ---------------- ridge / Cramer ----------------

  test("ridgeCramer3: recovers an exact linear law at lambda=0 " +
       "(b = (2, 3, -1) in micro, R2 = 1e6) and shrinks under ridge") {
    val rows = for (i <- 1 to 60) yield {
      val (x1, x2, x3) = ((i % 7 + 1).toLong, (i % 5 + 2).toLong,
        (i % 3 + 1).toLong)
      (x1, x2, x3, 2 * x1 + 3 * x2 - x3)
    }
    val df = rows.toDF("x1", "x2", "x3", "y")
    val exact = AggOps.ridgeCramer3(df, "x1", "x2", "x3", "y", 0L)
      .head()
    assert(exact.getLong(exact.fieldIndex("b1_micro")) === 2000000L)
    assert(exact.getLong(exact.fieldIndex("b2_micro")) === 3000000L)
    assert(exact.getLong(exact.fieldIndex("b3_micro")) === -1000000L)
    assert(exact.getLong(exact.fieldIndex("r2_micro")) === 1000000L)
    val ridge = AggOps.ridgeCramer3(df, "x1", "x2", "x3", "y", 5000L)
      .head()
    // ridge shrinks the solution norm and costs some fit
    assert(math.abs(ridge.getLong(1)) < 2000000L)
    assert(ridge.getLong(ridge.fieldIndex("r2_micro")) < 1000000L)
  }

  test("ridgeCramer3: partition-invariant (exact integer Gram sums " +
       "+ one pinned float block)") {
    val df = (1 to 200).map(i => (i % 9 + 1, i % 4 + 1, i % 6 + 1,
      i % 50 + 3)).toDF("x1", "x2", "x3", "y")
    val a = AggOps.ridgeCramer3(df.repartition(1),
      "x1", "x2", "x3", "y", 100L).collect().toSeq
    val b = AggOps.ridgeCramer3(df.repartition(13),
      "x1", "x2", "x3", "y", 100L).collect().toSeq
    assert(a === b)
  }

  // ---------------- permutation test ----------------

  test("pairedPermutationTest: t_obs is the plain sum, every t_b " +
       "matches a manual md5-sign replay, and p is the add-one " +
       "extreme fraction") {
    val pairs = Seq((1L, 5L), (2L, -3L), (3L, 2L), (4L, 7L), (5L, -1L))
      .toDF("id", "d")
    val out = EvalOps.pairedPermutationTest(pairs, "id", "d", b = 8)
      .orderBy("b").collect()
    assert(out.length === 8)
    assert(out.forall(_.getLong(out.head.fieldIndex("t_obs")) === 10L))
    // manual replay of replicate b using the same md5 rule
    val ds = Seq(1L -> 5L, 2L -> -3L, 3L -> 2L, 4L -> 7L, 5L -> -1L)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val manual = (0 until 8).map { b =>
      ds.map { case (id, d) =>
        val h = Integer.parseInt(md5hex(s"pt$b|$id").substring(0, 1), 16)
        if (h % 2 == 0) d else -d
      }.sum
    }
    assert(out.map(_.getLong(1)).toSeq === manual)
    val nExtreme = manual.count(t => math.abs(t) >= 10L)
    val pExpected = (nExtreme + 1L) * 1000000L / 9L
    assert(out.head.getLong(out.head.fieldIndex("p_micro")) === pExpected)
    out.foreach(r => assert(r.getBoolean(2) ===
      (math.abs(r.getLong(1)) >= 10L)))
  }

  // ---------------- streaming FM window ----------------

  test("q307: the streaming sketch's per-day state is SKETCH-sized — " +
       "every finalized day lands at most 32 bucket rows, never a " +
       "per-user set") {
    val out = SparkEntry.queries("q307_stream_fm")(spark,
      "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_buckets")) <= 32L) }
  }
}
