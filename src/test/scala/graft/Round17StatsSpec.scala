package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, EvalOps}

/** Round-17 batch-3 units: Gamma-GLM planted-effect recovery, the
  * KS test's hand-computable extremes, and the L2-boosting exact
  * fit on a piecewise-constant target. The oracled q404–q406 carry
  * the DuckDB hash checks. */
class Round17StatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("gammaIrls recovers a planted log-linear effect and the " +
       "null covariate stays near zero") {
    // y = exp(2 + 0.1*x1), x2 an independent small cycle
    val rows = for (x1 <- 1 to 30; rep <- 1 to 5) yield
      (x1.toLong, ((x1 + rep) % 3).toLong,
        math.round(math.exp(2.0 + 0.1 * x1)))
    val r = EvalOps.gammaIrls(rows.toDF("x1", "x2", "y"),
      "x1", "x2", "y", iters = 8).collect().head
    assert(r.getLong(0) === 150L)
    val b1 = r.getLong(2); val b2 = r.getLong(3)
    assert(math.abs(b1 - 100000L) < 2000L,
      s"b1 should recover 0.1 nats: $b1")
    assert(math.abs(b2) < 5000L, s"null covariate drifted: $b2")
    // calibration: sum mu ~ sum y at the optimum
    val gap = math.abs(r.getLong(5) / 1e9 - r.getLong(4))
    assert(gap / r.getLong(4).toDouble < 0.01,
      s"sum-mu calibration gap too wide: $gap")
    intercept[IllegalArgumentException] {
      EvalOps.gammaIrls(rows.toDF("x1", "x2", "y"), "x1", "x2", "y", 0)
    }
  }

  test("ksTest: disjoint samples read D = 1 and reject; an " +
       "identically-distributed split reads D = 0") {
    val disjoint = ((1 to 30).map(i => (i.toLong, true)) ++
      (41 to 60).map(i => (i.toLong, false))).toDF("v", "g")
    val d = EvalOps.ksTest(disjoint, "v", "g").collect().head
    assert(d.getLong(0) === 30L && d.getLong(1) === 20L)
    assert(d.getLong(4) === 1000000L, "disjoint supports: D = 1")
    // crit = 1.358*sqrt(50/600) ~ 0.392 << 1 at this n
    assert(d.getBoolean(6), "D = 1 rejects once n clears the " +
      "Smirnov critical value (tiny samples legitimately cannot)")
    // the same multiset on both sides: every level's ECDFs agree
    val same = (1 to 50).flatMap(i =>
      Seq((i.toLong % 7, true), (i.toLong % 7, false))).toDF("v", "g")
    val s = EvalOps.ksTest(same, "v", "g").collect().head
    assert(s.getLong(4) === 0L && !s.getBoolean(6))
    // a side with zero rows reads NULL metrics, not a crash
    val one = Seq((1L, true), (2L, true)).toDF("v", "g")
    val o = EvalOps.ksTest(one, "v", "g").collect().head
    assert(o.isNullAt(4) && o.isNullAt(6))
  }

  test("mcnemarPaired: hand-computed chi-square, symmetry reads 0, " +
       "perfect agreement reads (0, false)") {
    // b = 12, c = 3: chi2 = 81/15 = 5.4 > 3.841 -> significant
    val rows = Seq.fill(40)((true, true)) ++
      Seq.fill(12)((true, false)) ++ Seq.fill(3)((false, true)) ++
      Seq.fill(5)((false, false))
    val r = EvalOps.mcnemarPaired(rows.toDF("a", "b"), "a", "b",
      critMicro = 3841459L).collect().head
    assert(r.getLong(0) === 60L && r.getLong(1) === 40L)
    assert(r.getLong(2) === 12L && r.getLong(3) === 3L)
    assert(r.getLong(5) === 15L)
    assert(r.getLong(6) === 5400000L)
    assert(r.getBoolean(7))
    // b = c: the statistic is exactly 0 however large the counts
    val sym = (Seq.fill(9)((true, false)) ++
      Seq.fill(9)((false, true))).toDF("a", "b")
    val s = EvalOps.mcnemarPaired(sym, "a", "b", 3841459L)
      .collect().head
    assert(s.getLong(6) === 0L && !s.getBoolean(7))
    // perfect agreement: the pinned (0, false) convention
    val agree = Seq.fill(7)((true, true)).toDF("a", "b")
    val a = EvalOps.mcnemarPaired(agree, "a", "b", 3841459L)
      .collect().head
    assert(a.getLong(5) === 0L && a.getLong(6) === 0L &&
      !a.getBoolean(7))
  }

  test("kaplanMeierBy equals per-stratum kaplanMeier runs and " +
       "softmaxGlmBetas + softmaxPredExpr replay softmaxGlm exactly") {
    val rows = (1 to 120).map { i =>
      ((i % 2).toLong, ((i % 9) + 1).toLong, i % 5 != 0)
    }
    val df = rows.toDF("arm", "dur", "death")
    val byArm = EvalOps.kaplanMeierBy(df, "arm", "dur", "death")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.toSeq.drop(1))
      .toMap
    Seq(0L, 1L).foreach { arm =>
      val solo = EvalOps.kaplanMeier(df.where(col("arm") === arm),
        "dur", "death").collect()
      solo.foreach { r =>
        assert(byArm((arm, r.getLong(0))) === r.toSeq,
          s"arm $arm t ${r.getLong(0)} must match the solo curve")
      }
    }
    // softmax artifact scoring replays the in-plan fit bit for bit
    val cls = (1 to 300).map { i =>
      val x1 = i % 40
      val lab = if (x1 < 13) 0L else if (x1 < 27) 1L else 2L
      (x1.toLong, (i % 7).toLong, lab)
    }
    val cdf = cls.toDF("x1", "x2", "lab")
    val labels = Seq(0L, 1L, 2L)
    val fused = EvalOps.softmaxGlm(cdf, "x1", "x2", "lab", labels, 3)
      .orderBy("label", "pred").collect().map(_.toSeq)
    val sb = EvalOps.softmaxGlmBetas(cdf, "x1", "x2", "lab", labels, 3)
      .orderBy("label").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val scored = cdf.select(col("lab").as("_lab"),
        EvalOps.softmaxPredExpr(col("x1"), col("x2"), labels, sb)
          .as("_pred"))
      .groupBy(col("_lab").as("label"), col("_pred").as("pred"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("label", "pred").collect().map(_.toSeq)
    assert(fused.map(_.take(3)).toSeq === scored.toSeq,
      "artifact-scored confusion must equal the in-plan softmax fit")
  }

  test("brierDecomposition: Murphy's identity holds at level " +
       "granularity and a separable fixture reads all-resolution") {
    val rows = (1 to 400).map { i =>
      val hi = i % 2 == 0
      (if (hi) 100L else 0L, hi)
    }
    val r = EvalOps.brierDecomposition(rows.toDF("score", "y"),
      "score", "y", iters = 6).collect().head
    val (n, nl) = (r.getLong(0), r.getLong(1))
    assert(n === 400L && nl === 2L)
    val brier = r.getLong(2); val rel = r.getLong(3)
    val res = r.getLong(4); val unc = r.getLong(5)
    // saturated fit: nearly no calibration penalty, resolution
    // buys back (almost) the whole uncertainty floor
    assert(brier < 20000L && rel < 20000L)
    assert(unc === 250000L, "balanced outcome: unc = 0.25 exactly")
    assert(math.abs(res - unc) < 20000L)
    // Murphy: brier = rel - res + unc, up to per-level micro fixes
    assert(math.abs(brier - (rel - res + unc)) <= 2L * nl + 2L,
      s"identity drifted: $brier vs ${rel - res + unc}")
  }

  test("coxPhStratified: one stratum replays coxPh bit for bit; a " +
       "planted arm effect survives stratum-shifted baselines") {
    val rng = (1 to 240).map { i =>
      val arm = i % 2
      // arm halves the duration; stratum shifts the baseline
      val strat = i % 3
      val dur = (5 + strat * 4 + (i % 7)) / (arm + 1)
      (strat.toLong, dur.toLong, i % 11 != 0, arm.toLong)
    }
    val df = rng.toDF("strat", "dur", "death", "arm")
    val single = EvalOps.coxPhStratified(
      df.withColumn("strat", lit(0L)), "strat", "dur", "death",
      "arm", iters = 4).collect().head
    val plain = EvalOps.coxPh(df, "dur", "death", "arm", iters = 4)
      .collect().head
    assert(single.getLong(3) === plain.getLong(2),
      "one stratum must equal the unstratified beta exactly")
    assert(single.getLong(6) === plain.getLong(5) &&
      single.getLong(7) === plain.getLong(6),
      "one stratum must equal the unstratified U/I exactly")
    val strat = EvalOps.coxPhStratified(df, "strat", "dur", "death",
      "arm", iters = 4).collect().head
    assert(strat.getLong(2) === 3L)
    // the shorter-duration arm carries a strongly positive hazard
    assert(strat.getLong(3) > 300000L,
      s"planted effect must survive stratification: ${strat.getLong(3)}")
  }

  test("l2BoostStumps fits a piecewise-constant target EXACTLY in " +
       "one round and the residual mass is monotone non-increasing") {
    val step = (0 until 10).flatMap(x => Seq.fill(4)(
      (x.toLong, if (x < 5) 10L else 50L))).toDF("x", "y")
    val rounds = AggOps.l2BoostStumps(step, "x", "y", rounds = 3)
      .orderBy("round").collect()
    assert(rounds(0).getLong(1) === 4L)         // threshold
    assert(rounds(0).getLong(4) === 10000000L)  // left mean micro
    assert(rounds(0).getLong(5) === 50000000L)  // right mean micro
    assert(rounds(0).getLong(6) === 0L, "exact fit after round 1")
    assert(rounds.forall(_.getLong(6) === 0L))
    // a 3-level staircase needs two stumps: the second round must
    // cut the remaining |r| mass substantially (L2Boost guarantees
    // monotone SSE; on a strong-signal fixture |r| falls with it)
    val stairs = (0 until 10).flatMap(x => Seq.fill(4)((x.toLong,
      if (x < 3) 10L else if (x < 7) 30L else 70L))).toDF("x", "y")
    val sars = AggOps.l2BoostStumps(stairs, "x", "y", rounds = 3)
      .orderBy("round").collect().map(_.getLong(6)).toSeq
    assert(sars(1) < sars(0) / 2,
      s"round 2 must cut the staircase residual mass: $sars")
    assert(sars(2) <= sars(1),
      s"round 3 must not regress on the staircase: $sars")
    intercept[IllegalArgumentException] {
      AggOps.l2BoostStumps(step, "x", "y", rounds = 0)
    }
  }
}
