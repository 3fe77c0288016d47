package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, EvalOps}

/** Round-17 units for the ARIMA differencing rung and Kaplan–Meier:
  * hand-computed differences, the stationarity statement (a trended
  * series' PACF collapses after d=1 — the round-16 verdict's asked
  * spec), the exact reconstruction identity of the ARIMA backtest,
  * the textbook KM curve, and KM ↔ Nelson–Aalen agreement via
  * S(t) ≈ exp(−H(t)). The oracled q394–q397 carry the DuckDB hash
  * checks; these pin semantics no oracle restates. */
class Round17SeriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("differencedSeries: hand-computed d=1 and D=1@3 values, " +
       "original t kept, argument validation") {
    val s = Seq((1L, 10L), (2L, 13L), (3L, 18L), (4L, 20L),
      (5L, 29L), (6L, 31L)).toDF("t", "x")
    val d1 = AggOps.differencedSeries(s, "t", "x", d = 1)
      .orderBy("t").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(d1.toSeq === Seq((2L, 3L), (3L, 5L), (4L, 2L), (5L, 9L),
      (6L, 2L)))
    val sd = AggOps.differencedSeries(s, "t", "x", d = 0,
        seasonalLag = 3, seasonalD = 1)
      .orderBy("t").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sd.toSeq === Seq((4L, 10L), (5L, 16L), (6L, 13L)))
    val both = AggOps.differencedSeries(s, "t", "x", d = 1,
        seasonalLag = 3, seasonalD = 1)
      .orderBy("t").collect().map(r => (r.getLong(0), r.getLong(1)))
    // w_t = x_t - x_{t-1} - x_{t-3} + x_{t-4}:
    // t=5: 29-20-13+10 = 6; t=6: 31-29-18+13 = -3
    assert(both.toSeq === Seq((5L, 6L), (6L, -3L)))
    intercept[IllegalArgumentException] {
      AggOps.differencedSeries(s, "t", "x", d = 0)
    }
    intercept[IllegalArgumentException] {
      AggOps.differencedSeries(s, "t", "x", d = 0, seasonalLag = 0,
        seasonalD = 1)
    }
  }

  test("a linear-trend series becomes stationary after d=1: the " +
       "raw PACF(1) is ~1, the differenced PACF(1) collapses") {
    // x_t = 50t + bounded deterministic pseudo-noise
    val rows = (1 to 120).map { t =>
      (t.toLong, 50L * t + (t * 2654435761L % 17L))
    }
    val s = rows.toDF("t", "x")
    val rawP1 = AggOps.pacf(s, "t", "x", maxLag = 3)
      .where(col("lag") === 1).collect().head.getLong(1)
    assert(rawP1 > 900000L,
      s"trend must dominate the raw PACF(1), got $rawP1")
    val w = AggOps.differencedSeries(s, "t", "x", d = 1)
    val difP1 = AggOps.pacf(w, "t", "x", maxLag = 3)
      .where(col("lag") === 1).collect().head.getLong(1)
    assert(math.abs(difP1) < 700000L,
      s"differencing must collapse the PACF(1), got $difP1")
  }

  test("arimaBacktest: on trend+seasonal(+noise) data the exact " +
       "double-difference reconstruction beats seasonal-naive") {
    // x_t = 7t + s(t mod 7) + small period-5 ripple: the
    // seasonal-naive error is dominated by the 49/step trend drift;
    // ARIMA's reconstruction absorbs trend AND season exactly and
    // only the ripple's double difference remains for the AR term
    // (the ripple keeps the differenced series non-degenerate — a
    // pure trend+season fixture zeroes w and nulls the fit)
    val season = Array(0L, 12L, 3L, 25L, 7L, 18L, 9L)
    val rows = (1 to 140).map { t =>
      (t.toLong, 7L * t + season(t % 7) + (t % 5).toLong)
    }
    val s = rows.toDF("t", "x")
    val arima = AggOps.arimaBacktest(s, "t", "x", order = 2,
      seasonalLag = 7)
    val am = arima.select(max(col("mae_micro"))).collect()
      .head.getLong(0)
    val sn = AggOps.seasonalNaiveBacktest(s, "t", "x", period = 7)
      .select(max(col("mae_micro"))).collect().head.getLong(0)
    assert(am * 3 < sn,
      s"ARIMA must beat seasonal-naive on trended data: $am vs $sn")
    assert(am < 15L * 1000000L,
      s"one-step MAE should be a few ripple units, got $am micro")
  }

  test("kaplanMeier: the textbook product-limit curve, censoring " +
       "only drops at-risk, Greenwood saturates to NULL, median flag") {
    // durations: 1 death, 2 death+death (n=5 at t=1; 4 at t=2),
    // 3 censored, 4 death — classic small example
    val df = Seq((1L, true), (2L, true), (2L, true), (3L, false),
      (4L, true)).toDF("dur", "death")
    val km = EvalOps.kaplanMeier(df, "dur", "death")
      .orderBy("t").collect()
    // t=1: n=5, d=1, f=800000, S=800000
    // t=2: n=4, d=2, f=500000, S=400000  <- median crossing
    // t=3: n=2, d=0, f=1000000, S=400000
    // t=4: n=1, d=1, f=0, S=0, greenwood saturates -> NULL
    val rows = km.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.isNullAt(5), r.getBoolean(7)))
    assert(rows.toSeq === Seq(
      (1L, 5L, 1L, 800000L, 800000L, false, false),
      (2L, 4L, 2L, 500000L, 400000L, false, true),
      (3L, 2L, 0L, 1000000L, 400000L, false, false),
      (4L, 1L, 1L, 0L, 0L, true, false)))
    // Greenwood at t=1: 1/(5*4) = 0.05 -> 50000000 nano
    assert(km(0).getLong(5) === 50000000L)
    // at t=2: 0.05 + 2/(4*2) = 0.3 -> 300000000 nano
    assert(km(1).getLong(5) === 300000000L)
    // se at t=2: 0.4 * sqrt(0.3) = 0.219089 -> 219089 micro
    assert(km(1).getLong(6) === 219089L)
    // the median flag fires at the FIRST crossing only
    assert(km.count(_.getBoolean(7)) === 1)
  }

  test("kaplanMeier agrees with nelsonAalen: S(t) ~ exp(-H(t)) on a " +
       "small-hazard fixture") {
    // 200 subjects, hazards of a few % per level: the product-limit
    // and exponentiated cumulative hazard agree to second order
    val rows = (1 to 200).map { i =>
      val dur = (i % 10) + 1L
      val death = i % 7 != 0
      (dur, death)
    }
    val df = rows.toDF("dur", "death")
    val km = EvalOps.kaplanMeier(df, "dur", "death")
      .select(col("t"), col("s_micro")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val na = EvalOps.nelsonAalen(df, "dur", "death")
      .select(col("t"), col("cum_hazard_ppm")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(km.keySet === na.keySet)
    // the agreement S(t) ~ exp(-H(t)) is second order in the
    // per-level hazards, so it holds on the SMALL-hazard head
    // (t <= 4 here: n_at_risk >= 140, h <= 12%) and legitimately
    // widens at the tail where the at-risk set shrinks and h
    // reaches 40%+ — that divergence is the estimators' documented
    // difference, not an implementation gap
    (1L to 4L).foreach { t =>
      val s = km(t)
      val expNegH = math.exp(-na(t) / 1e6) * 1e6
      assert(math.abs(s - expNegH) / expNegH < 0.08,
        s"t=$t: S=$s vs exp(-H)=$expNegH")
      assert(s <= expNegH + 1,
        s"product-limit must sit below exp(-H): t=$t $s vs $expNegH")
    }
  }
}
