package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EvalOps

/** Effect sizes + Tukey HSD (round 14, batch F). */
class Round14EffectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ----- effectSizes ----------------------------------------------

  /** A = {4, 6} (mean 5, SS_dev 2), B = {1, 3} (mean 2, SS_dev 2):
    * pooled var = (2+2)/2 = 2, d = 3/√2; disjoint above → P = 4,
    * Q = 0, δ = 1. */
  private def esFixture(): DataFrame =
    Seq((4L, true), (6L, true), (1L, false), (3L, false))
      .toDF("v", "a")

  test("effectSizes: hand-computed d, g, and Cliff's delta") {
    val r = EvalOps.effectSizes(esFixture(), "v", "a").collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 4L && r.getLong(3) === 0L) // P, Q
    assert(r.getLong(4) === 3000000L) // mean diff
    val d = 3.0 / math.sqrt(2.0)
    assert(r.getLong(5) === math.round(d * 1e6))
    assert(r.getLong(6) ===
      math.round(d * (1.0 - 3.0 / (4.0 * 4.0 - 9.0)) * 1e6))
    assert(r.getLong(7) === 1000000L) // δ = 1
  }

  test("effectSizes: overlapping groups give a fractional delta; " +
       "ties count in neither P nor Q") {
    // A = {1, 3}, B = {2, 3}: pairs a>b: (3,2)=1; a<b: (1,2), (1,3);
    // tie (3,3) → P = 1, Q = 2, δ = −1/4
    val df = Seq((1L, true), (3L, true), (2L, false), (3L, false))
      .toDF("v", "a")
    val r = EvalOps.effectSizes(df, "v", "a").collect()(0)
    assert(r.getLong(2) === 1L && r.getLong(3) === 2L)
    assert(r.getLong(7) === -250000L)
  }

  test("effectSizes: zero pooled variance → null d/g, delta intact") {
    val df = Seq((5L, true), (5L, true), (2L, false), (2L, false))
      .toDF("v", "a")
    val r = EvalOps.effectSizes(df, "v", "a").collect()(0)
    assert(r.isNullAt(5) && r.isNullAt(6))
    assert(r.getLong(7) === 1000000L)
  }

  test("effectSizes: singleton sides (n = 2 total) → null d/g " +
       "without tripping the ANSI zero-division") {
    val df = Seq((5L, true), (2L, false)).toDF("v", "a")
    val r = EvalOps.effectSizes(df, "v", "a").collect()(0)
    assert(r.isNullAt(5) && r.isNullAt(6))
    assert(r.getLong(4) === 3000000L)
  }

  test("effectSizes is partition-invariant") {
    def run(d: DataFrame) =
      EvalOps.effectSizes(d, "v", "a").collect().toSeq
    assert(run(esFixture().repartition(5)) ===
      run(esFixture().coalesce(1)))
  }

  // ----- tukeyHsd -------------------------------------------------

  /** A = {1, 3}, B = {5, 7}, C = {5, 5}: means 2/6/5; SSW =
    * 2 + 2 + 0 = 4, MSW = 4/3. */
  private def hsdFixture(): DataFrame =
    Seq(("A", 1L), ("A", 3L), ("B", 5L), ("B", 7L), ("C", 5L),
      ("C", 5L)).toDF("g", "y")

  test("tukeyHsd: hand-computed pairwise q statistics and verdicts") {
    val rows = EvalOps.tukeyHsd(hsdFixture(), "g", "y", qCrit = 3.0)
      .orderBy("g_a", "g_b").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("A", "B"), ("A", "C"), ("B", "C")))
    val msw = 4.0 / 3.0
    val se = math.sqrt(msw / 2.0 * (1.0 / 2 + 1.0 / 2))
    assert(rows(0).getLong(4) === -4000000L) // A−B diff
    assert(rows(0).getLong(5) === math.round(-4.0 / se * 1e6))
    assert(rows(0).getBoolean(6)) // |q| = 4.9 ≥ 3
    assert(rows(1).getLong(4) === -3000000L)
    assert(rows(2).getLong(4) === 1000000L)
    assert(!rows(2).getBoolean(6)) // |q| = 1.22 < 3
  }

  test("tukeyHsd: zero MSW → null q, diff intact") {
    val df = Seq(("A", 2L), ("A", 2L), ("B", 7L), ("B", 7L))
      .toDF("g", "y")
    val r = EvalOps.tukeyHsd(df, "g", "y", 3.0).collect()(0)
    assert(r.getLong(4) === -5000000L)
    assert(r.isNullAt(5) && r.isNullAt(6))
  }

  test("tukeyHsd is partition-invariant") {
    def run(d: DataFrame) =
      EvalOps.tukeyHsd(d, "g", "y", 3.0).orderBy("g_a", "g_b")
        .collect().toSeq
    assert(run(hsdFixture().repartition(7)) ===
      run(hsdFixture().coalesce(1)))
  }
}
