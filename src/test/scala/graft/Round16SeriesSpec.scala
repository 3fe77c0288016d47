package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, EvalOps, TextOps}

/** Round-16 batch C/D: PACF cut-off on an AR(1) fixture, Ljung–Box
  * discrimination (seasonal vs noise), the Holt–Winters exact-replay
  * fixture (a stationary seasonal series smooths with zero error),
  * the two-covariate Cox planted-effect recovery, and the pruned
  * unigram trainer's shrinking-inventory/coverage invariants. */
class Round16SeriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ar1Fixture(phi: Double, n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    var x = 0.0
    (1 to n).map { t =>
      x = phi * x + rnd.nextGaussian() * 10
      (t.toLong, math.round(x * 10))
    }.toDF("t", "x")
  }

  test("pacf cuts off after lag 1 on an AR(1) series") {
    val out = AggOps.pacf(ar1Fixture(0.7, 300, 42L), "t", "x",
        maxLag = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) > 500000L, s"lag-1 pacf ${out(1L)} should be ~phi")
    (2L to 5L).foreach { k =>
      assert(math.abs(out(k)) < 200000L,
        s"lag-$k pacf ${out(k)} should be near zero for AR(1)")
    }
  }

  test("pacf lag 1 equals the micro-fixed acf lag 1") {
    val df = ar1Fixture(0.5, 200, 7L)
    val a1 = AggOps.acf(df, "t", "x", 3).where(col("lag") === 1)
      .collect().head.getDouble(2)
    val p1 = AggOps.pacf(df, "t", "x", 3)
      .where(col("lag") === 1).collect().head.getLong(1)
    assert(p1 == math.round(a1 * 1e6))
  }

  test("yule-walker order 1 equals pacf lag 1; AR(1) loads on phi1") {
    val df = ar1Fixture(0.7, 300, 42L)
    val yw1 = AggOps.yuleWalkerAr(df, "t", "x", order = 1)
      .collect().head.getLong(1)
    val p1 = AggOps.pacf(df, "t", "x", 1).collect().head.getLong(1)
    assert(yw1 == p1)
    val ar5 = AggOps.yuleWalkerAr(df, "t", "x", order = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ar5(1L) > 500000L, s"AR(1) weight on phi1: $ar5")
    (2L to 5L).foreach(j => assert(math.abs(ar5(j)) < 250000L,
      s"phi$j ${ar5(j)} should be small for AR(1)"))
  }

  test("ar backtest beats the unconditional mean on an AR series") {
    val df = ar1Fixture(0.8, 300, 13L)
    val out = AggOps.arBacktest(df, "t", "x", order = 3).collect()
    assert(out.length == 297)
    val maeAr = out.head.getLong(4)
    // the naive forecaster predicts the series mean everywhere
    val xs = df.collect().map(_.getLong(1))
    val mean = math.round(xs.sum.toDouble / xs.length * 1e6)
    val ts = out.map(_.getLong(0)).toSet
    val maeMean = xs.zipWithIndex
      .filter { case (_, i) => ts.contains(i + 1L) }
      .map { case (x, _) => math.abs(x * 1000000L - mean) }
    val naive = maeMean.sum / maeMean.length
    assert(maeAr < naive * 3 / 4,
      s"AR mae $maeAr should clearly beat naive $naive on phi=0.8")
    // every forecast step used all 3 lags: t starts at 4
    assert(out.map(_.getLong(0)).min == 4L)
  }

  test("seasonal-naive backtest is exact on a pure weekly pattern") {
    val s = Seq(3L, -1L, 4L, -2L, 0L, -5L, 1L)
    val weekly = (1 to 28).map(t =>
      (t.toLong, 100L + s((t - 1) % 7))).toDF("t", "x")
    val out = AggOps.seasonalNaiveBacktest(weekly, "t", "x",
      period = 7).collect()
    assert(out.length == 21 && out.forall(_.getLong(3) == 0L))
    assert(out.forall(_.getLong(4) == 0L)) // MAE 0
    // and the prediction is literally last week's value
    val jittered = (1 to 28).map(t =>
      (t.toLong, 100L + t)).toDF("t", "x")
    val j = AggOps.seasonalNaiveBacktest(jittered, "t", "x", 7)
      .collect()
    assert(j.forall(r => r.getLong(2) == (r.getLong(1) - 7) * 1000000L))
    assert(j.forall(_.getLong(3) == 7000000L)) // +1/day drift => err 7
  }

  test("q390 publishes exactly one winning forecaster") {
    val rows = SparkEntry.queries("q390_forecast_selection")(spark,
      "/root/testdata/sf0.001").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("ar5", "holt_winters", "seasonal_naive"))
    assert(rows.count(_.getBoolean(2)) == 1)
    val best = rows.filter(_.getBoolean(2)).head
    assert(best.getLong(1) == rows.map(_.getLong(1)).min)
  }

  test("hw residual whiteness: exact fit => null Q, noise => finite") {
    val s = Seq(3L, -1L, 4L, -2L, 0L, -5L, 1L)
    val exact = (0 until 28).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i.toLong)), 100L + s(i % 7))
    }.toDF("d", "x")
    def adequacy(days: org.apache.spark.sql.DataFrame) = {
      val hw = AggOps.holtWinters(days, "d", "x", 300000L, 100000L,
        200000L, period = 7)
      val resid = hw.select(col("t"),
          (col("x") * 1000000L - col("fitted_micro")).as("_rm"))
        .withColumn("_r", expr(
          "CASE WHEN _rm < 0 THEN -((-_rm) div 1000) " +
            "ELSE _rm div 1000 END"))
      AggOps.ljungBox(resid, "t", "_r", maxLag = 3).collect().head
    }
    // the fixed-point fixture leaves ZERO residual everywhere: the
    // ACF denominator degenerates and Q is null, not a crash
    assert(adequacy(exact).isNullAt(2))
    val rnd = new scala.util.Random(5L)
    val noisy = (0 until 42).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i.toLong)),
        100L + s(i % 7) + rnd.nextInt(11) - 5)
    }.toDF("d", "x")
    val q = adequacy(noisy)
    assert(!q.isNullAt(2) && q.getLong(2) >= 0L)
  }

  test("ljung-box separates seasonal structure from noise") {
    val seasonal = (1 to 210).map(t =>
      (t.toLong, (100 + 50 * ((t - 1) % 7)).toLong)).toDF("t", "x")
    val qSeason = AggOps.ljungBox(seasonal, "t", "x", 7)
      .collect().head.getLong(2)
    val rnd = new scala.util.Random(11L)
    val noise = (1 to 210).map(t =>
      (t.toLong, math.round(rnd.nextGaussian() * 100))).toDF("t", "x")
    val qNoise = AggOps.ljungBox(noise, "t", "x", 7)
      .collect().head.getLong(2)
    // chi2(7) 99th percentile ~ 18.5; the seasonal Q is enormous
    assert(qSeason > 100000000L, s"seasonal Q $qSeason")
    assert(qNoise < 20000000L, s"noise Q $qNoise")
  }

  test("holt-winters replays a stationary seasonal series exactly") {
    // x_t = 100 + s_slot with the weekly indices summing to zero:
    // l0 = 100 exactly, b0 = 0, s_i = the true indices => every
    // one-step forecast is exact and the state is a fixed point
    val s = Seq(3L, -1L, 4L, -2L, 0L, -5L, 1L)
    val days = (0 until 28).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i.toLong)), 100L + s(i % 7))
    }.toDF("d", "x")
    val out = AggOps.holtWinters(days, "d", "x", 300000L, 100000L,
      200000L, period = 7).collect()
    assert(out.length == 21) // T - p = 28 - 7
    assert(out.forall(_.getLong(4) == 0L),
      s"errors ${out.map(_.getLong(4)).toSeq}")
    assert(out.forall(_.getLong(5) == 0L)) // MAE 0
    // fitted equals the actual in micro
    assert(out.forall(r => r.getLong(3) == r.getLong(2) * 1000000L))
  }

  test("holt-winters forecast projects the exact seasonal pattern") {
    // same fixed-point fixture as the replay test: the final state is
    // (l = 100e6, b = 0, s = true indices), so f_{T+h} must equal
    // (100 + s_slot)·1e6 exactly for every horizon step
    val s = Seq(3L, -1L, 4L, -2L, 0L, -5L, 1L)
    val days = (0 until 28).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i.toLong)), 100L + s(i % 7))
    }.toDF("d", "x")
    val out = AggOps.holtWintersForecast(days, "d", "x", 300000L,
      100000L, 200000L, period = 7, horizon = 14)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2)))
    assert(out.length == 14)
    out.foreach { case (h, day, f) =>
      val t = 28 + h // 1-based day index of the forecast
      assert(f == (100L + s(((t - 1) % 7).toInt)) * 1000000L,
        s"h=$h day=$day forecast $f")
    }
    assert(out.head._2 == "2024-01-29") // day T+1
  }

  test("holt-winters yields empty output under the two-week minimum") {
    val days = (0 until 14).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i.toLong)), 100L)
    }.toDF("d", "x")
    assert(AggOps.holtWinters(days, "d", "x", 300000L, 100000L,
      200000L, period = 7).count() == 0L)
  }

  test("coxPh2 recovers a planted effect and a null covariate") {
    // x1 = 1 shortens survival MODERATELY (overlapping duration
    // supports keep beta inside the documented 21-nat phi bound —
    // a separable fixture diverges loudly under ANSI, by design);
    // x2 cycles independently of duration (null effect)
    val rows = (0 until 400).map { i =>
      val x1 = i % 2
      val base = 10 + (i * 7919) % 23 // spread duration levels
      val dur = base - x1 * 2
      (dur.toLong, true, x1.toLong, (i % 3).toLong)
    }
    val out = EvalOps.coxPh2(rows.toDF("dur", "death", "x1", "x2"),
      "dur", "death", "x1", "x2", iters = 4).collect().head
    val b1 = out.getLong(2); val b2 = out.getLong(3)
    assert(b1 > 300000L, s"planted hazard effect b1 $b1")
    assert(math.abs(b2) < math.abs(b1) / 4,
      s"null covariate b2 $b2 vs b1 $b1")
    // information matrix readout is symmetric PD at the optimum
    val i11 = out.getLong(8); val i12 = out.getLong(9)
    val i22 = out.getLong(10)
    assert(i11 > 0 && i22 > 0 &&
      i11.toDouble * i22 > i12.toDouble * i12)
  }

  test("coxPh2 freezes on a degenerate second covariate") {
    // constant x2 makes the information singular: dI = 0 every step
    // and beta stays at the origin rather than erroring
    val rows = (0 until 100).map(i =>
      ((10 + i % 5).toLong, true, (i % 2).toLong, 1L))
    val out = EvalOps.coxPh2(rows.toDF("dur", "death", "x1", "x2"),
      "dur", "death", "x1", "x2", iters = 3).collect().head
    assert(out.getLong(2) == 0L && out.getLong(3) == 0L)
  }

  test("q381 is a LIVE one-covariate Cox fit on the fixture") {
    // the round-16 lesson behind q380/q381: q357's churn death rule
    // never fires at test scales, so its green hash pins a vacuous
    // beta = 0 trajectory; the conversion question must not be that
    val r = SparkEntry.queries("q381_cox_conversion")(spark,
      "/root/testdata/sf0.001").collect().head
    assert(r.getLong(1) > 0L, "no events -> vacuous fit")
    assert(r.getLong(2) != 0L, "beta pinned at zero -> vacuous fit")
  }

  test("pruned unigram trainer shrinks the inventory, keeps coverage") {
    val vocab = Seq(("intern", 12L), ("internal", 9L), ("nation", 7L),
      ("national", 6L), ("internation", 3L), ("internat", 2L),
      ("nat", 5L), ("inter", 8L), ("onal", 4L), ("altern", 2L))
      .toDF("w", "f")
    val out = TextOps.unigramTrainPruned(vocab, "w", "f", rounds = 3,
      maxPieceLen = 4, topMulti = 32, prunePct = 25)
    val sizes = out.groupBy("round").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes(1L) > sizes(2L) && sizes(2L) > sizes(3L),
      s"inventory must shrink: $sizes")
    // every single character of the vocabulary survives all rounds
    val chars = Seq("i", "n", "t", "e", "r", "a", "o", "l", "s")
      .filter("internal national alternates".contains(_))
    val last = out.where(col("round") === 3)
      .select("piece").collect().map(_.getString(0)).toSet
    "internalnationalternat".map(_.toString).toSet.foreach {
      (c: String) => assert(last.contains(c), s"single '$c' pruned")
    }
    // and the final cost table still segments every vocab word
    val costs = out.where(col("round") === 3)
      .select("piece", "cost_micro").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val seg = TextOps.unigramViterbi(vocab, "w", costs, 4)
      .select(col("w"), col("n_pieces"), col("score_micro")).collect()
    seg.foreach { r =>
      assert(r.getLong(1) > 0L && r.getLong(2) < Long.MaxValue / 4,
        s"word ${r.getString(0)} lost coverage after pruning")
    }
  }
}
