package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AggOps

/** Round-18 Hannan–Rissanen ARMA units (round-17 verdict task 2):
  * shape/kind contract of the coefficient table, MA-term recovery on
  * a constructed MA(1) series a pure AR truncates, and the
  * degenerate all-zero freeze. The oracled q415/q416/q397 carry the
  * DuckDB hash checks. */
class Round18SeriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic mean-zero "innovation" pattern. */
  private def innov(t: Long): Long = ((t * 37) % 21) - 10

  test("armaHr: the coefficient table has the (c, ar x p, ma x q) " +
       "contract rows, and on an MA(1)-built series the MA " +
       "coefficient is materially nonzero") {
    // x_t = 100 + e_t + 0.8 e_{t-1}, e deterministic mean-zero
    val rows = (2L to 400L).map(t =>
      (t, 100L + innov(t) + math.round(0.8 * innov(t - 1))))
    val df = rows.toDF("t", "x")
    val fit = AggOps.armaHr(df, "t", "x", p = 1, q = 1, longAr = 5)
      .orderBy("kind", "j").collect()
    assert(fit.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("ar", 1L), ("c", 0L), ("ma", 1L)))
    // ma coefficients are per MILLI residual unit (documented):
    // theta_nat = 0.8 reads ~800 micro, not 800000
    val ma1 = fit.find(_.getString(0) == "ma").get.getLong(2)
    assert(math.abs(ma1) > 300L && math.abs(ma1) < 2000L,
      s"MA(1) signal not picked up at the milli scale: theta' = $ma1")
  }

  test("armaHrBacktest beats the pure-AR backtest on the MA(1) " +
       "series (the truncation a finite AR cannot close)") {
    val rows = (2L to 400L).map(t =>
      (t, 100L + innov(t) + math.round(0.8 * innov(t - 1))))
    val df = rows.toDF("t", "x")
    val armaMae = AggOps.armaHrBacktest(df, "t", "x",
        p = 1, q = 1, longAr = 5)
      .select(col("mae_micro")).head().getLong(0)
    val arMae = AggOps.arBacktest(df, "t", "x", order = 1)
      .select(col("mae_micro")).head().getLong(0)
    assert(armaMae < arMae,
      s"ARMA(1,1) MAE $armaMae should beat AR(1) MAE $arMae")
  }

  test("armaHr degenerate freeze: a CONSTANT series has a singular " +
       "stage-2 Gram and reads the documented all-zero table") {
    val df = (1L to 50L).map(t => (t, 7L)).toDF("t", "x")
    val fit = AggOps.armaHr(df, "t", "x", p = 2, q = 1, longAr = 5)
      .collect()
    assert(fit.length === 4)
    assert(fit.forall(_.getLong(2) === 0L))
  }

  test("arForecastBand: the SE fan is monotone nondecreasing in h, " +
       "the band is symmetric around the forecast, and the 95% " +
       "one-step band covers most in-sample one-step errors") {
    val rows = (1L to 300L).map(t =>
      (t, 200L + ((t * 13) % 17) - 8 + (t % 7)))
    val df = rows.toDF("t", "x")
    val band = AggOps.arForecastBand(df, "t", "x",
      order = 2, horizon = 7, zMicro = 1959964L).orderBy("h").collect()
    assert(band.length === 7)
    val ses = band.map(_.getLong(2))
    assert(ses.zip(ses.tail).forall { case (a, b) => a <= b },
      s"SE fan must widen: ${ses.mkString(",")}")
    band.foreach { r =>
      assert(r.getLong(1) - r.getLong(3) === r.getLong(4) - r.getLong(1))
    }
    // one-step coverage: err <= z*se1 for >= 75% of backtest steps
    val margin1 = band.head.getLong(1) - band.head.getLong(3)
    val errs = AggOps.arBacktest(df, "t", "x", order = 2)
      .select(col("err_micro")).collect().map(_.getLong(0))
    val cov = errs.count(_ <= margin1).toDouble / errs.length
    assert(cov >= 0.75, s"one-step band coverage $cov below 0.75")
  }

  test("arForecastBand degenerate: a series shorter than the fit " +
       "minimum reads NULL forecasts, not an index error") {
    val df = Seq((1L, 5L), (2L, 6L)).toDF("t", "x")
    val band = AggOps.arForecastBand(df, "t", "x",
      order = 2, horizon = 3, zMicro = 1959964L).collect()
    assert(band.length === 3)
    assert(band.forall(_.isNullAt(1))) // forecasts NULL, no throw
  }

  test("hwForecastBand: a stationary exactly-seasonal series has " +
       "zero one-step error, so the band collapses onto the exact " +
       "forecast; a noisy series widens monotonically") {
    import java.sql.Date
    def day(i: Int): Date = Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong))
    val pat = Seq(10L, 12L, 9L, 11L, 14L, 20L, 17L)
    val exact = (0 until 35).map(i => (day(i), pat(i % 7)))
      .toDF("d", "x")
    val b0 = AggOps.hwForecastBand(exact, "d", "x", 300000L, 100000L,
      200000L, period = 7, horizon = 7, zMicro = 1959964L)
      .orderBy("h").collect()
    assert(b0.length === 7)
    b0.foreach { r =>
      assert(r.getAs[Long]("se_micro") === 0L)
      assert(r.getAs[Long]("lo_micro") === r.getAs[Long]("forecast_micro"))
      assert(r.getAs[Long]("hi_micro") === r.getAs[Long]("forecast_micro"))
    }
    val noisy = (0 until 35).map(i =>
      (day(i), pat(i % 7) + ((i * 13) % 5))).toDF("d", "x")
    val b1 = AggOps.hwForecastBand(noisy, "d", "x", 300000L, 100000L,
      200000L, period = 7, horizon = 7, zMicro = 1959964L)
      .orderBy("h").collect()
    val ses = b1.map(_.getAs[Long]("se_micro"))
    assert(ses.head > 0L)
    assert(ses.zip(ses.tail).forall { case (a, b) => a <= b },
      s"HW SE fan must widen: ${ses.mkString(",")}")
    b1.foreach { r =>
      assert(r.getAs[Long]("forecast_micro") - r.getAs[Long]("lo_micro")
        === r.getAs[Long]("hi_micro") - r.getAs[Long]("forecast_micro"))
    }
  }

  test("armaHrBacktest rows carry exact one-step errors and the " +
       "shared exact-division MAE") {
    val rows = (2L to 60L).map(t =>
      (t, 50L + innov(t) + math.round(0.5 * innov(t - 1))))
    val df = rows.toDF("t", "x")
    val bt = AggOps.armaHrBacktest(df, "t", "x",
      p = 1, q = 1, longAr = 5).collect()
    assert(bt.nonEmpty)
    val maes = bt.map(_.getLong(4)).distinct
    assert(maes.length === 1) // one shared MAE
    bt.foreach { r =>
      assert(r.getLong(3) ===
        math.abs(r.getLong(1) * 1000000L - r.getLong(2)))
    }
  }
}
