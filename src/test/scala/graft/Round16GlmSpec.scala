package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CleanOps, EvalOps, TextOps}

/** Round-16 batch A/B: the symspellPairs hostile-word guard, K-class
  * one-vs-rest classification (separable-fixture recovery, confusion
  * bookkeeping, tie rule), Platt scaling (direction, calibration,
  * isotonic agreement), and the DP clipped-mean release (clipping
  * arithmetic, ε-monotonicity). */
class Round16GlmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("symspellPairs fails loudly on a word over maxWordLen") {
    val hostile = Seq(("a" * 30, 1L), ("cat", 2L))
      .toDF("w", "f")
    val e = intercept[Exception] {
      TextOps.symspellPairs(hostile, "w", "f").collect()
    }
    assert(e.getMessage != null || e.getCause != null)
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("maxWordLen"), s"unexpected error: $msg")
  }

  test("symspellPairs unchanged for in-bound vocabularies") {
    val vocab = Seq(("cat", 5L), ("cut", 3L), ("dog", 2L))
      .toDF("w", "f")
    val rows = TextOps.symspellPairs(vocab, "w", "f")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2)))
    assert(rows.toSet == Set(("cat", "cut", 1L)))
    // raising the bound explicitly admits longer words
    val long = Seq(("a" * 30, 1L), ("b" + "a" * 29, 1L))
      .toDF("w", "f")
    val big = TextOps.symspellPairs(long, "w", "f", maxWordLen = 32)
      .collect()
    assert(big.length == 1 && big.head.getLong(2) == 1L)
  }

  private def ovrFixture = {
    // three linearly separable x1 bands; x2 varies so the 3x3 Gram
    // stays nonsingular (a constant column freezes Newton at 0)
    val rows = (0 until 150).map { i =>
      val cls = i % 3
      val x1 = cls * 20 + (i / 3) % 10 // 0..9 / 20..29 / 40..49
      (x1.toLong, (i % 5).toLong, cls.toLong)
    }
    rows.toDF("x1", "x2", "lab")
  }

  test("logisticOvr separates a separable 3-class fixture") {
    val out = EvalOps.logisticOvr(ovrFixture, "x1", "x2", "lab",
      labels = Seq(0L, 1L, 2L), iters = 6).collect()
    val n = out.head.getLong(3)
    assert(n == 150L)
    val accPpm = out.head.getLong(5)
    assert(accPpm >= 990000L, s"acc_ppm $accPpm on separable data")
    // confusion mass adds up to n
    assert(out.map(_.getLong(2)).sum == n)
    // diagonal dominates every class
    val diag = out.filter(r => r.getLong(0) == r.getLong(1))
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    Seq(0L, 1L, 2L).foreach { c =>
      assert(diag.getOrElse(c, 0L) >= 48L, s"class $c diag $diag")
    }
  }

  test("softmaxGlm separates the same separable 3-class fixture") {
    val out = EvalOps.softmaxGlm(ovrFixture, "x1", "x2", "lab",
      labels = Seq(0L, 1L, 2L), iters = 6).collect()
    assert(out.head.getLong(3) == 150L)
    val accPpm = out.head.getLong(5)
    assert(accPpm >= 990000L, s"softmax acc_ppm $accPpm")
    assert(out.map(_.getLong(2)).sum == 150L)
    // and it agrees with OvR's verdict on the same data
    val ovrAcc = EvalOps.logisticOvr(ovrFixture, "x1", "x2", "lab",
      labels = Seq(0L, 1L, 2L), iters = 6).collect().head.getLong(5)
    assert(math.abs(accPpm - ovrAcc) <= 20000L,
      s"softmax $accPpm vs ovr $ovrAcc")
  }

  test("logisticOvr scores labels outside the list under own label") {
    val df = ovrFixture.withColumn("lab",
      when(col("lab") === 2L, 7L).otherwise(col("lab")))
    val out = EvalOps.logisticOvr(df, "x1", "x2", "lab",
      labels = Seq(0L, 1L, 7L), iters = 6).collect()
    assert(out.map(_.getLong(0)).toSet == Set(0L, 1L, 7L))
  }

  private def plattFixture = {
    // monotone link from score to outcome with deterministic noise:
    // flip every 10th row so the problem is not perfectly separable
    (1 to 200).map { i =>
      val base = i > 100
      val y = if (i % 10 == 0) !base else base
      (i.toLong, y)
    }.toDF("score", "y")
  }

  test("plattScale recovers a positive slope and calibrates") {
    val out = EvalOps.plattScale(plattFixture, "score", "y",
      iters = 6).collect().head
    val n = out.getLong(0)
    val b1 = out.getLong(2)
    val sumY = out.getLong(3)
    val sumP = out.getLong(4)
    val brier = out.getLong(5)
    assert(n == 200L && sumY == 100L)
    assert(b1 > 0L, s"slope must be positive on a monotone fixture, got $b1")
    // at the IRLS optimum with an intercept sum(p) == sum(y); after 6
    // fixed steps the gap should be well under one unit of outcome
    assert(math.abs(sumP - sumY * 1000000000L) < 500000000L,
      s"calibration gap ${sumP - sumY * 1000000000L}")
    // Brier must beat the uninformed p=0.5 baseline (250000 micro)
    assert(brier < 250000L, s"brier_micro $brier")
  }

  test("platt and isotonic agree on a monotone fixture") {
    val out = EvalOps.plattScale(plattFixture, "score", "y",
      iters = 6).collect().head
    val (b0, b1) = (out.getLong(1), out.getLong(2))
    def p(s: Long): Double =
      1.0 / (1.0 + math.exp(-((b0 + s * b1).toDouble / 1e6)))
    // the parametric curve is monotone and brackets the flip point
    assert(p(10) < 0.2 && p(190) > 0.8 && p(10) < p(100) &&
      p(100) < p(190))
  }

  test("K-class classifiers read the reference task's CIC-shaped " +
       "fixture (the q45/BENCH_ML accuracy question)") {
    // the BenchMl fixture shape at spec scale: a skewed 80/15/5
    // 3-class label deciding per-feature regimes (cls+1)*(10+0.37j)
    // + uniform noise -- the reference's Label is exactly this kind
    // of 3-class problem, and its regime bands are separable
    val df = spark.range(0, 20000, 1, 4)
      .withColumn("cls", when(pmod(col("id"), lit(100)) < 80, 0L)
        .when(pmod(col("id"), lit(100)) < 95, 1L).otherwise(2L))
      .withColumn("x1", round((col("cls") + 1) * 10.0 +
        rand(42L) * 5.0, 0).cast("long"))
      .withColumn("x2", round((col("cls") + 1) * 13.7 +
        rand(43L) * 5.0, 0).cast("long"))
    val ovr = EvalOps.logisticOvr(df, "x1", "x2", "cls",
      labels = Seq(0L, 1L, 2L), iters = 6).collect().head
    assert(ovr.getLong(3) == 20000L)
    assert(ovr.getLong(5) >= 950000L,
      s"OvR acc_ppm ${ovr.getLong(5)} on the CIC-shaped fixture")
    val sm = EvalOps.softmaxGlm(df, "x1", "x2", "cls",
      labels = Seq(0L, 1L, 2L), iters = 6).collect().head
    assert(sm.getLong(5) >= 950000L,
      s"softmax acc_ppm ${sm.getLong(5)} on the CIC-shaped fixture")
  }

  test("confusionReport computes per-class P/R/F1 from the table") {
    // classes: 0 (clean), 1 (confused with 2), 3 (never predicted),
    // 9 (phantom: predicted but never a true label)
    val conf = Seq(
      (0L, 0L, 10L),
      (1L, 1L, 6L), (1L, 2L, 4L),
      (2L, 2L, 8L), (2L, 1L, 2L),
      (3L, 0L, 5L),
      (1L, 9L, 1L))
      .toDF("label", "pred", "cnt")
    val out = EvalOps.confusionReport(conf, "label", "pred", "cnt")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((10L, 5L, 0L)))   // tp 10, fp from label 3
    assert(out(1L) == ((6L, 2L, 5L)))    // fn: 4 to class 2, 1 to 9
    assert(out(2L) == ((8L, 4L, 2L)))
    assert(out(3L) == ((0L, 0L, 5L)))    // never predicted: fn-only
    assert(out(9L) == ((0L, 1L, 0L)))    // phantom: fp-only
    val ppm = EvalOps.confusionReport(conf, "label", "pred", "cnt")
      .where(col("label") === 1L).collect().head
    assert(ppm.getLong(4) == 750000L)    // 6/8
    assert(ppm.getLong(5) == 545454L)    // 6/11 truncating div
    assert(ppm.getLong(6) == 631578L)    // 12/19
    // degenerate ppm are null, not errors
    val deg = EvalOps.confusionReport(conf, "label", "pred", "cnt")
      .where(col("label") === 3L).collect().head
    assert(deg.isNullAt(4) && deg.getLong(5) == 0L)
  }

  test("poissonOverdispersion separates variance regimes") {
    // variance 400 >> mean 20: alternating 0/40 counts at every cell
    val over = (0 until 400).map(i =>
      ((i % 5).toLong, (i % 3).toLong, if (i % 2 == 0) 0L else 40L))
      .toDF("x1", "x2", "y")
    val o = EvalOps.poissonOverdispersion(over, "x1", "x2", "y",
      iters = 6, zCritMicro = 1644854L).collect().head
    assert(o.getBoolean(5), s"t_micro ${o.getLong(4)} must flag")
    assert(o.getLong(4) > 1644854L)
    // constant counts: variance 0 < mean => T negative, no flag
    val under = (0 until 400).map(i =>
      ((i % 5).toLong, (i % 3).toLong, 20L)).toDF("x1", "x2", "y")
    val u = EvalOps.poissonOverdispersion(under, "x1", "x2", "y",
      iters = 6, zCritMicro = 1644854L).collect().head
    assert(!u.getBoolean(5) && u.getLong(4) < 0L,
      s"constant counts are underdispersed, got ${u.getLong(4)}")
  }

  test("negativeBinomialIrls reduces EXACTLY to poisson at alpha=0") {
    val grid = (0 until 300).map { i =>
      ((i % 6).toLong, (i % 4).toLong, (3 + (i % 7) + (i % 6)).toLong)
    }.toDF("x1", "x2", "y")
    val nb = EvalOps.negativeBinomialIrls(grid, "x1", "x2", "y",
      iters = 5, alphaMicro = 0L).collect().head
    val po = EvalOps.poissonIrls(grid, "x1", "x2", "y", iters = 5)
      .collect().head
    // v = 1e6 collapses the inflated weight and score to the Poisson
    // spellings bit for bit -- the whole trajectory must coincide
    (0 until 7).foreach(c => assert(nb.getLong(c) == po.getLong(c),
      s"col $c: nb ${nb.getLong(c)} vs poisson ${po.getLong(c)}"))
  }

  test("negativeBinomialIrls dampens weights under real dispersion") {
    // alpha shrinks the IRLS weight of high-mu rows: a large alpha
    // must still converge and track the same mean structure
    val grid = (0 until 300).map { i =>
      ((i % 6).toLong, (i % 4).toLong, (3 + (i % 7) + (i % 6)).toLong)
    }.toDF("x1", "x2", "y")
    val nb = EvalOps.negativeBinomialIrls(grid, "x1", "x2", "y",
      iters = 6, alphaMicro = 200000L).collect().head
    val po = EvalOps.poissonIrls(grid, "x1", "x2", "y", iters = 6)
      .collect().head
    // same mean model: coefficients agree to ~5e-3 nats (alpha = 0.2
    // genuinely reweights high-mu rows, shifting the fit slightly)
    (1 to 3).foreach(c => assert(
      math.abs(nb.getLong(c) - po.getLong(c)) < 5000L,
      s"col $c: nb ${nb.getLong(c)} vs poisson ${po.getLong(c)}"))
    assert(math.abs(nb.getLong(5) - nb.getLong(4) * 1000000000L) <
      nb.getLong(4) * 1000000L, "sum(mu) must track sum(y)")
  }

  test("dpQuantile: high epsilon recovers the exact empirical rank") {
    val df = (1 to 100).map(_.toLong).toDF("x")
    // eps = 50: the utility term dominates every Gumbel draw, and on
    // distinct ranks 1..100 the ONLY zero-gap candidate is v = 50
    val r = CleanOps.dpQuantile(df, "x", lo = 0L, hi = 100L,
      qPpm = 500000L, epsilon = 50.0, salt = "s").collect().head
    assert(r.getLong(0) == 100L && r.getLong(1) == 50L)
    assert(r.getLong(4) == 0L, s"true_err ${r.getLong(4)}")
    assert(r.getLong(2) == 50L, s"released ${r.getLong(2)}")
    // small epsilon still releases inside the candidate domain and
    // stays deterministic under the seeded draw
    val lo = CleanOps.dpQuantile(df, "x", 0L, 100L, 500000L, 0.01,
      "s").collect().head
    assert(lo.getLong(2) >= 0L && lo.getLong(2) <= 100L)
    val lo2 = CleanOps.dpQuantile(df, "x", 0L, 100L, 500000L, 0.01,
      "s").collect().head
    assert(lo.getLong(2) == lo2.getLong(2))
  }

  test("dpClippedMean clips, releases, and scales noise with epsilon") {
    val df = (Seq.fill(50)(100L) ++ Seq(20000L, -500L))
      .toDF("x") // two out-of-range rows clip to hi/lo
    def run(eps: Double) =
      CleanOps.dpClippedMean(df, "x", lo = 0L, hi = 10000L,
        epsilon = eps, salt = "s16").collect().head
    val r = run(0.5)
    assert(r.getLong(0) == 52L)
    assert(r.getLong(1) == 50L * 100L + 10000L + 0L)
    assert(r.getLong(4) ==
      r.getLong(1) * 1000000L + r.getLong(3)) // released = sum + noise
    assert(r.getLong(6) == r.getLong(2) + r.getLong(5))
    // same seeded u => noise magnitude strictly decreasing in eps
    val mags = Seq(0.25, 0.5, 1.0)
      .map(e => math.abs(run(e).getLong(3)))
    assert(mags(0) > mags(1) && mags(1) > mags(2),
      s"noise not monotone in eps: $mags")
  }
}
