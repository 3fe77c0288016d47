package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EvalOps

/** Logistic IRLS + IPW ATT (round 15 batch A): the integer-exact
  * Newton chain against a from-scratch Scala replay, ground-truth
  * recovery on a deterministic sigmoid fixture, partition invariance,
  * and the CEM-vs-IPW agreement read on a balanced design. */
class Round15LogisticSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** From-scratch replay of the integer IRLS algorithm (exact-integer
    * z, nano sigmoid, micro weight by integer division, Cramer solve)
    * — the hand-computation the operator must reproduce. */
  private def refIrls(rows: Seq[(Long, Long, Long)],
                      iters: Int): (Long, Long, Long) = {
    var (b0, b1, b2) = (0L, 0L, 0L)
    for (_ <- 1 to iters) {
      var (a00, a01, a02, a11, a12, a22) = (0L, 0L, 0L, 0L, 0L, 0L)
      var (s0, s1, s2) = (0L, 0L, 0L)
      rows.foreach { case (x1, x2, y) =>
        val zm = b0 + x1 * b1 + x2 * b2
        val mu = math.round(1e9 / (1.0 + math.exp(-(zm.toDouble / 1e6))))
        val w = (mu * (1000000000L - mu)) / 1000000000000L
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

  /** Deterministic pseudo-uniform in [0, 1) from an id (md5 prefix —
    * the q79 convention). */
  private def u01(id: Long, salt: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt|$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.substring(0, 9), 16).toDouble /
      java.lang.Long.parseLong("1000000000", 16).toDouble
  }

  /** Ground-truth sigmoid fixture: y = [u < sigma(0.8 + 0.35 x1 −
    * 0.25 x2)] with x1 in 0..9, x2 in 0..7, deterministic u. */
  private def sigmoidFixture(n: Int): Seq[(Long, Long, Long)] =
    (0 until n).map { i =>
      val x1 = (i % 10).toLong
      val x2 = (i % 8).toLong
      val p = 1.0 / (1.0 + math.exp(-(0.8 + 0.35 * x1 - 0.25 * x2)))
      val y = if (u01(i.toLong, "logit") < p) 1L else 0L
      (x1, x2, y)
    }

  test("logisticIrls matches the from-scratch integer IRLS replay " +
       "on a hand-built fixture") {
    // non-separable on purpose (y = 1 only for x1 in {3,4,5}, with
    // x1 = 7 labeled 0): a separable fixture would drive beta toward
    // infinity and the test would pin overflow behavior, not math
    val rows = Seq[(Long, Long, Long)](
      (0L, 1L, 0L), (1L, 2L, 0L), (2L, 1L, 0L), (3L, 3L, 1L),
      (4L, 2L, 1L), (5L, 4L, 1L), (2L, 5L, 0L), (7L, 2L, 0L))
    val df = rows.toDF("x1", "x2", "yb")
      .select(col("x1"), col("x2"), (col("yb") === 1L).as("y"))
    val got = EvalOps.logisticIrls(df, "x1", "x2", "y", iters = 4)
      .collect().head
    val (b0, b1, b2) = refIrls(rows, 4)
    assert(got.getAs[Long]("n") === 8L)
    assert(got.getAs[Long]("b0_micro") === b0)
    assert(got.getAs[Long]("b1_micro") === b1)
    assert(got.getAs[Long]("b2_micro") === b2)
    // readout columns agree with a direct scoring replay
    val correct = rows.count { case (x1, x2, y) =>
      (b0 + x1 * b1 + x2 * b2 > 0) == (y == 1L)
    }
    assert(got.getAs[Long]("correct") === correct.toLong)
    assert(got.getAs[Long]("acc_ppm") === correct.toLong * 1000000L / 8L)
  }

  test("logisticIrls recovers ground-truth coefficients on a " +
       "deterministic sigmoid fixture and beats the majority class") {
    val rows = sigmoidFixture(4000)
    val df = rows.toDF("x1", "x2", "yb")
      .select(col("x1"), col("x2"), (col("yb") === 1L).as("y"))
    val got = EvalOps.logisticIrls(df, "x1", "x2", "y", iters = 6)
      .collect().head
    val b0 = got.getAs[Long]("b0_micro") / 1e6
    val b1 = got.getAs[Long]("b1_micro") / 1e6
    val b2 = got.getAs[Long]("b2_micro") / 1e6
    assert(math.abs(b0 - 0.8) < 0.25, s"b0=$b0")
    assert(math.abs(b1 - 0.35) < 0.1, s"b1=$b1")
    assert(math.abs(b2 + 0.25) < 0.1, s"b2=$b2")
    val majority = math.max(rows.count(_._3 == 1L),
      rows.count(_._3 == 0L))
    assert(got.getAs[Long]("correct") > majority,
      s"correct=${got.getAs[Long]("correct")} majority=$majority")
  }

  test("logisticIrls is partition-invariant") {
    val rows = sigmoidFixture(500)
    val df = rows.toDF("x1", "x2", "yb")
      .select(col("x1"), col("x2"), (col("yb") === 1L).as("y"))
    val a = EvalOps.logisticIrls(df, "x1", "x2", "y", 4)
      .collect().head.toSeq
    val b = EvalOps.logisticIrls(df.repartition(7), "x1", "x2", "y", 4)
      .collect().head.toSeq
    assert(a === b)
  }

  test("ipwAtt and cemAtt agree on a balanced randomized design " +
       "and both sit near the true effect") {
    // treat assigned independently of x (hash coin); y = 100 + 5·x1 +
    // 20·treat + small hash noise — true ATT = 20 (micro 20e6)
    val rows = (0 until 6000).map { i =>
      val x1 = (i % 6).toLong
      val x2 = (i % 4).toLong
      val t = u01(i.toLong, "assign") < 0.4
      val noise = math.round(u01(i.toLong, "noise") * 8) - 4
      val y = 100L + 5L * x1 + (if (t) 20L else 0L) + noise
      (x1, x2, t, y)
    }
    val df = rows.toDF("x1", "x2", "treat", "y")
    val ipw = EvalOps.ipwAtt(df, "x1", "x2", "treat", "y", iters = 4)
      .collect().head
    val att = ipw.getAs[Long]("att_micro") / 1e6
    assert(math.abs(att - 20.0) < 1.0, s"ipw att=$att")
    assert(ipw.getAs[Long]("n_c_trimmed") === 0L)
    // CEM on the exact-x1 stratum agrees
    val cem = EvalOps.cemAtt(
      df.select(col("x1").as("stratum"), col("treat"), col("y")),
      "stratum", "treat", "y").collect()
    val cemAtt = cem.head.getAs[Long]("att_micro") / 1e6
    assert(math.abs(att - cemAtt) < 1.0, s"ipw=$att cem=$cemAtt")
    // balanced design: weighting does not worsen x1 balance
    val before = math.abs(ipw.getAs[Long]("smd_before_micro"))
    val after = math.abs(ipw.getAs[Long]("smd_after_micro"))
    assert(before < 100000L, s"before=$before") // |SMD| < 0.1
    assert(after < 100000L, s"after=$after")
  }

  test("ipwAtt corrects confounding that biases the raw difference") {
    // confounded: treatment probability rises with x1, y rises with
    // x1, true treatment effect = 10
    val rows = (0 until 8000).map { i =>
      val x1 = (i % 8).toLong
      val x2 = (i % 3).toLong
      val pT = 0.1 + 0.08 * x1
      val t = u01(i.toLong, "conf") < pT
      val y = 50L + 12L * x1 + (if (t) 10L else 0L)
      (x1, x2, t, y)
    }
    val df = rows.toDF("x1", "x2", "treat", "y")
    val got = EvalOps.ipwAtt(df, "x1", "x2", "treat", "y", iters = 5)
      .collect().head
    val att = got.getAs[Long]("att_micro") / 1e6
    val rawDiff = {
      val t = rows.filter(_._3).map(_._4)
      val c = rows.filterNot(_._3).map(_._4)
      t.sum.toDouble / t.size - c.sum.toDouble / c.size
    }
    assert(math.abs(att - 10.0) < math.abs(rawDiff - 10.0),
      s"ipw att=$att rawDiff=$rawDiff")
    assert(math.abs(att - 10.0) < 3.0, s"att=$att")
    // weighting must improve covariate balance
    val before = math.abs(got.getAs[Long]("smd_before_micro"))
    val after = math.abs(got.getAs[Long]("smd_after_micro"))
    assert(after < before, s"after=$after before=$before")
  }

  test("ipwAtt trims above-cap weights, counts them, and survives a " +
       "singular Gram (constant features freeze beta at 0)") {
    // constant x1 = x2 = 1 makes the Gram collinear with the
    // intercept: dA = 0 every step, beta stays 0, every propensity
    // is exactly 0.5, every control weight exactly 1e6 micro — a
    // 1-micro cap trims ALL controls deterministically
    val rows = (0 until 400).map { i =>
      (1L, 1L, i % 4 != 0, 100L)
    }
    val df = rows.toDF("x1", "x2", "treat", "y")
    val got = EvalOps.ipwAtt(df, "x1", "x2", "treat", "y", iters = 4,
      wCapMicro = 1L).collect().head
    assert(got.getAs[Long]("n_c") === 100L)
    assert(got.getAs[Long]("n_c_trimmed") === 100L)
    assert(got.isNullAt(got.fieldIndex("mean_c_w_micro")))
    assert(got.isNullAt(got.fieldIndex("att_micro")))
    // same singular design at the default cap: weight 1e6 is kept,
    // nothing trimmed, ATT = plain mean difference = 0
    val kept = EvalOps.ipwAtt(df, "x1", "x2", "treat", "y", iters = 4)
      .collect().head
    assert(kept.getAs[Long]("n_c_trimmed") === 0L)
    assert(kept.getAs[Long]("att_micro") === 0L)
  }
}
