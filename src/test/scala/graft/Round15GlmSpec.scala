package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EvalOps

/** Poisson IRLS (round 15 batch H): the exp-link Newton chain against
  * a from-scratch scalar replay, ground-truth recovery on a
  * deterministic rate fixture, and the Σμ = Σy calibration identity
  * at the optimum. */
class Round15GlmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** From-scratch replay of the integer Poisson IRLS: null-model
    * seed, 13-nat saturation, nano μ, micro weight, Cramer solve. */
  private def refPoisson(rows: Seq[(Long, Long, Long)],
                         iters: Int): (Long, Long, Long) = {
    val n = rows.size
    val sy = rows.map(_._3).sum
    var b0 = if (n > 0)
      BigDecimal(math.log((sy + 1).toDouble / n) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    else 0L
    var (b1, b2) = (0L, 0L)
    for (_ <- 1 to iters) {
      var (a00, a01, a02, a11, a12, a22) = (0L, 0L, 0L, 0L, 0L, 0L)
      var (s0, s1, s2) = (0L, 0L, 0L)
      rows.foreach { case (x1, x2, y) =>
        val zm = math.min(b0 + x1 * b1 + x2 * b2, 13000000L)
        val mu = math.round(math.exp(zm.toDouble / 1e6) * 1e9)
        val w = mu / 1000L
        a00 += w; a01 += w * x1; a02 += w * x2
        a11 += w * x1 * x1; a12 += w * x1 * x2; a22 += w * x2 * x2
        val r = y * 1000000000L - mu
        s0 += r; s1 += r * x1; s2 += r * x2
      }
      def det(m11: Double, m12: Double, m13: Double,
              m21: Double, m22: Double, m23: Double,
              m31: Double, m32: Double, m33: Double): Double =
        m11 * (m22 * m33 - m23 * m32) -
          m12 * (m21 * m33 - m23 * m31) +
          m13 * (m21 * m32 - m22 * m31)
      val dA = det(a00.toDouble, a01.toDouble, a02.toDouble,
        a01.toDouble, a11.toDouble, a12.toDouble,
        a02.toDouble, a12.toDouble, a22.toDouble)
      val d0 = det(s0.toDouble, a01.toDouble, a02.toDouble,
        s1.toDouble, a11.toDouble, a12.toDouble,
        s2.toDouble, a12.toDouble, a22.toDouble)
      val d1 = det(a00.toDouble, s0.toDouble, a02.toDouble,
        a01.toDouble, s1.toDouble, a12.toDouble,
        a02.toDouble, s2.toDouble, a22.toDouble)
      val d2 = det(a00.toDouble, a01.toDouble, s0.toDouble,
        a01.toDouble, a11.toDouble, s1.toDouble,
        a02.toDouble, a12.toDouble, s2.toDouble)
      if (dA != 0.0) {
        b0 += math.round(1e3 * d0 / dA)
        b1 += math.round(1e3 * d1 / dA)
        b2 += math.round(1e3 * d2 / dA)
      }
    }
    (b0, b1, b2)
  }

  private def realGrid: Seq[(Long, Long, Long)] =
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(to_date(col("ts")).as("d"),
        hour(col("ts")).cast("long").as("x1"))
      .agg(count(lit(1)).as("y"))
      .select(col("x1"),
        (pmod(datediff(col("d"), lit("1970-01-01")) + 4, lit(7)) + 1)
          .cast("long").as("x2"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq

  test("the distributed chain matches the scalar replay on the real " +
       "hourly grid, step for step") {
    val rows = realGrid
    val got = EvalOps.poissonIrls(rows.toDF("x1", "x2", "y"),
      "x1", "x2", "y", iters = 6).head()
    val want = refPoisson(rows, 6)
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) === want)
    assert(got.getLong(0) === rows.size.toLong)
    assert(got.getLong(4) === rows.map(_._3).sum)
  }

  test("ground-truth recovery: deterministic counts from a known " +
       "log-linear rate recover beta within 0.02 nats") {
    // mu = exp(2.0 + 0.08*x1 - 0.15*x2), y = round(mu): noise-free
    val rows = for (x1 <- 0L to 23L; x2 <- 1L to 7L) yield
      (x1, x2, math.round(math.exp(2.0 + 0.08 * x1 - 0.15 * x2)))
    val got = EvalOps.poissonIrls(rows.toDF("x1", "x2", "y"),
      "x1", "x2", "y", iters = 6).head()
    assert(math.abs(got.getLong(1) - 2000000L) < 20000L, "b0")
    assert(math.abs(got.getLong(2) - 80000L) < 20000L, "b1")
    assert(math.abs(got.getLong(3) + 150000L) < 20000L, "b2")
  }

  test("calibration identity: at the converged optimum the fitted " +
       "mass matches the observed mass (sum mu ~= sum y)") {
    val rows = realGrid
    val got = EvalOps.poissonIrls(rows.toDF("x1", "x2", "y"),
      "x1", "x2", "y", iters = 6).head()
    val want = got.getLong(4) * 1000000000L
    val gap = math.abs(got.getLong(5) - want).toDouble / want
    assert(gap < 0.01, s"sum_mu off by ${gap * 100}%")
  }
}
