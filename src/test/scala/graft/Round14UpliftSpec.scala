package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EvalOps

/** Uplift / shrinkage / preference-ranking family (round 14, batch
  * D): Qini curve, empirical-Bayes beta-binomial shrinkage,
  * Bradley–Terry MM — hand-computed fixtures, degenerate guards,
  * partition invariance.
  */
class Round14UpliftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ----- qiniCurve ------------------------------------------------

  /** Scores 4..1 over (arm, conv): the top half is ALL treated
    * converters, the bottom half all non-converting controls —
    * bucket 1 has no controls (null qini), bucket 2 closes at
    * qini = 2, uplift = 1. */
  private def qiniFixture(): DataFrame =
    Seq((4L, true, true), (3L, true, true),
      (2L, false, false), (1L, false, false))
      .toDF("s", "arm", "conv")

  test("qiniCurve: hand-computed buckets, null guard on an " +
       "all-treated prefix") {
    val rows = EvalOps.qiniCurve(qiniFixture(), "s", "arm", "conv", 2)
      .orderBy("bucket").collect()
    assert(rows.length === 2)
    val b1 = rows(0)
    assert(b1.getLong(0) === 1L)
    assert(b1.getLong(1) === 2L && b1.getLong(2) === 2L) // n_t, x_t
    assert(b1.getLong(3) === 0L) // n_c
    assert(b1.isNullAt(9) && b1.isNullAt(10)) // cn_c = 0 → nulls
    val b2 = rows(1)
    assert(b2.getLong(5) === 2L && b2.getLong(7) === 2L) // cn_t, cn_c
    assert(b2.getLong(9) === 2000000L) // qini = 2 − 0·2/2
    assert(b2.getLong(10) === 1000000L) // uplift = 1 − 0
  }

  test("qiniCurve: tied scores share a level and land in one bucket") {
    // 4 units, all score 7 → one level, before = 0 → bucket 1 only
    val df = Seq((7L, true, true), (7L, false, false),
      (7L, true, false), (7L, false, true)).toDF("s", "arm", "conv")
    val rows = EvalOps.qiniCurve(df, "s", "arm", "conv", 4).collect()
    assert(rows.length === 1)
    assert(rows(0).getLong(0) === 1L)
    // qini = 1 − 1·2/2 = 0; uplift = 1/2 − 1/2 = 0
    assert(rows(0).getLong(9) === 0L)
    assert(rows(0).getLong(10) === 0L)
  }

  test("qiniCurve is partition-invariant") {
    def run(d: DataFrame) =
      EvalOps.qiniCurve(d, "s", "arm", "conv", 2)
        .orderBy("bucket").collect().toSeq
    assert(run(qiniFixture().repartition(5)) ===
      run(qiniFixture().coalesce(1)))
  }

  // ----- empiricalBayesRate ---------------------------------------

  /** A: 2/4, B: 1/4, C: 3/4 → ppm rates 500000/250000/750000;
    * μ = 0.5, v = 1/24, s₀ = 5, α = β = 2.5;
    * shrunk: A (2+2.5)/9, B (1+2.5)/9, C (3+2.5)/9. */
  private def ebFixture(): DataFrame =
    Seq(("A", true), ("A", true), ("A", false), ("A", false),
      ("B", true), ("B", false), ("B", false), ("B", false),
      ("C", true), ("C", true), ("C", true), ("C", false))
      .toDF("item", "conv")

  test("empiricalBayesRate: hand-computed beta-binomial prior and " +
       "shrunk rates") {
    val rows = EvalOps.empiricalBayesRate(ebFixture(), "item", "conv")
      .orderBy("item").collect()
    assert(rows.map(_.getLong(3)).toSeq ===
      Seq(500000L, 250000L, 750000L))
    // replicate the op's double spelling for the prior
    val sr = 1500000.0; val srr = 8.75e11; val k = 3.0
    val mu = sr / k / 1e6
    val va = (srr / k - (sr / k) * (sr / k)) / 1e12
    val s0 = mu * (1.0 - mu) / va - 1.0
    val alpha = math.round(mu * s0 * 1e6)
    rows.foreach { r =>
      assert(r.getLong(4) === alpha)
      assert(r.getLong(5) === math.round((1.0 - mu) * s0 * 1e6))
    }
    val shrunk = Seq(2L, 1L, 3L).map(x =>
      math.round((x.toDouble + mu * s0) / (4.0 + s0) * 1e6))
    assert(rows.map(_.getLong(6)).toSeq === shrunk)
    // shrinkage pulls toward the mean: B up, C down
    assert(rows(1).getLong(6) > rows(1).getLong(3))
    assert(rows(2).getLong(6) < rows(2).getLong(3))
  }

  test("empiricalBayesRate: identical rates → degenerate variance → " +
       "null prior and null shrunk rates") {
    val df = Seq(("A", true), ("A", false), ("B", true), ("B", false))
      .toDF("item", "conv")
    val rows = EvalOps.empiricalBayesRate(df, "item", "conv")
      .collect()
    assert(rows.forall(r => r.isNullAt(4) && r.isNullAt(6)))
    assert(rows.forall(_.getLong(3) === 500000L))
  }

  test("empiricalBayesRate is partition-invariant") {
    def run(d: DataFrame) =
      EvalOps.empiricalBayesRate(d, "item", "conv")
        .orderBy("item").collect().toSeq
    assert(run(ebFixture().repartition(7)) ===
      run(ebFixture().coalesce(1)))
  }

  // ----- bradleyTerry ---------------------------------------------

  test("bradleyTerry: two items at 3−1 reach the exact fixed point " +
       "w_A : w_B = 3 : 1 in one sweep") {
    val pairs = Seq(("A", "B", 3L, 1L)).toDF("a", "b", "wa", "wb")
    val rows = EvalOps.bradleyTerry(pairs, "a", "b", "wa", "wb", 5)
      .orderBy("rank").collect()
    assert(rows(0).getString(0) === "A")
    assert(rows(0).getLong(2) === 1500000L)
    assert(rows(1).getLong(2) === 500000L)
    assert(rows.map(_.getLong(3)).toSeq === Seq(1L, 2L))
  }

  test("bradleyTerry: transitive sweep ranks A > B > C; a zero-win " +
       "item pins to strength 0") {
    val pairs = Seq(("A", "B", 2L, 0L), ("B", "C", 2L, 0L),
      ("A", "C", 2L, 0L)).toDF("a", "b", "wa", "wb")
    val rows = EvalOps.bradleyTerry(pairs, "a", "b", "wa", "wb", 5)
      .orderBy("rank").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("A", "B", "C"))
    assert(rows(0).getLong(2) > rows(1).getLong(2))
    assert(rows(2).getLong(2) === 0L) // C never wins → MLE boundary
    assert(rows(2).getLong(1) === 0L) // total_wins
  }

  test("bradleyTerry: iters must be >= 1") {
    val pairs = Seq(("A", "B", 1L, 1L)).toDF("a", "b", "wa", "wb")
    intercept[IllegalArgumentException] {
      EvalOps.bradleyTerry(pairs, "a", "b", "wa", "wb", 0)
    }
  }

  test("bradleyTerry is partition-invariant") {
    val pairs = Seq(("A", "B", 3L, 1L), ("B", "C", 2L, 2L),
      ("A", "C", 1L, 2L)).toDF("a", "b", "wa", "wb")
    def run(d: DataFrame) =
      EvalOps.bradleyTerry(d, "a", "b", "wa", "wb", 3)
        .orderBy("rank").collect().toSeq
    assert(run(pairs.repartition(6)) === run(pairs.coalesce(1)))
  }
}
