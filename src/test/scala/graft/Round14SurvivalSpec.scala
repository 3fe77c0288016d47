package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EvalOps

/** Log-rank test + G-test (round 14, batch H). */
class Round14SurvivalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ----- logRank --------------------------------------------------

  /** A: events at t=1 and t=2; B: event at t=1, censored at t=3.
    * By hand: E-terms 1.0 + 0.5, V-terms 1/3 + 1/4, O_A = 2. */
  private def lrFixture(): DataFrame =
    Seq((1L, true, true), (2L, true, true),
      (1L, true, false), (3L, false, false))
      .toDF("dur", "event", "arm")

  test("logRank: hand-computed O−E and χ²") {
    val r = EvalOps.logRank(lrFixture(), "dur", "event", "arm")
      .collect()(0)
    assert((0 to 3).map(r.getLong) === Seq(2L, 2L, 2L, 1L))
    assert(r.getLong(4) === 500000L) // 2e6 − 1.5e6
    val se = 1500000.0; val sv = 583333.0
    val chi2 = math.round((2.0 - se / 1e6) * (2.0 - se / 1e6) /
      (sv / 1e6) * 1e6)
    assert(r.getLong(5) === chi2)
  }

  test("logRank: identical survival in both arms → O−E = 0, χ² = 0") {
    val df = Seq((1L, true, true), (2L, true, true),
      (1L, true, false), (2L, true, false)).toDF("dur", "event", "arm")
    val r = EvalOps.logRank(df, "dur", "event", "arm").collect()(0)
    assert(r.getLong(4) === 0L)
    assert(r.getLong(5) === 0L)
  }

  test("logRank: all censored → no event times, null readouts, " +
       "counts intact") {
    val df = Seq((5L, false, true), (7L, false, false))
      .toDF("dur", "event", "arm")
    val r = EvalOps.logRank(df, "dur", "event", "arm").collect()(0)
    assert(r.getLong(0) === 1L && r.getLong(1) === 1L)
    assert(r.getLong(2) === 0L && r.getLong(3) === 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("logRank: single-at-risk tail times contribute nothing") {
    // B's lone event at t=9 has n = 1 → excluded by the n > 1 rule;
    // result must equal the same fixture without that row's term —
    // only the totals differ
    val base = Seq((1L, true, true), (2L, true, false))
    val withTail = base :+ ((9L, true, false))
    val r = EvalOps.logRank(withTail.toDF("dur", "event", "arm"),
      "dur", "event", "arm").collect()(0)
    // t=1: d=1 n=3 E=1/3; t=2: d=1 n=2 E=0 (na=0) — t=9 n=1 dropped
    val se = math.round(1.0 / 3.0 * 1e6) + 0L
    assert(r.getLong(4) === 1000000L - se)
  }

  test("logRank is partition-invariant") {
    def run(d: DataFrame) =
      EvalOps.logRank(d, "dur", "event", "arm").collect().toSeq
    assert(run(lrFixture().repartition(5)) ===
      run(lrFixture().coalesce(1)))
  }

  // ----- gTest ----------------------------------------------------

  test("gTest: hand-computed 2×2 with per-term nano rounding") {
    def rows(a: String, b: Long, k: Int) = Seq.fill(k)((a, b))
    val df = (rows("x", 1L, 10) ++ rows("x", 2L, 10) ++
      rows("y", 1L, 10) ++ rows("y", 2L, 30)).toDF("a", "b")
    val r = EvalOps.gTest(df, "a", "b").collect()(0)
    assert(r.getLong(0) === 60L)
    assert(r.getLong(3) === 1L) // dof
    def term(o: Double, rr: Double, c: Double): Long =
      math.round(2.0 * o * math.log(o * 60.0 / (rr * c)) * 1e9)
    val g = term(10, 20, 20) + term(10, 20, 40) +
      term(10, 40, 20) + term(30, 40, 40)
    assert(r.getLong(4) === g)
    assert(r.getLong(5) === g / 1000L)
    assert(g > 0L)
  }

  test("gTest: a proportional table scores exactly zero") {
    def rows(a: String, b: Long, k: Int) = Seq.fill(k)((a, b))
    val df = (rows("x", 1L, 2) ++ rows("x", 2L, 4) ++
      rows("y", 1L, 3) ++ rows("y", 2L, 6)).toDF("a", "b")
    val r = EvalOps.gTest(df, "a", "b").collect()(0)
    assert(r.getLong(4) === 0L && r.getLong(5) === 0L)
  }

  test("gTest agrees in magnitude class with chiSquareIndependence " +
       "on the same table (both ≈ the association strength)") {
    def rows(a: String, b: Long, k: Int) = Seq.fill(k)((a, b))
    val df = (rows("x", 1L, 40) ++ rows("x", 2L, 10) ++
      rows("y", 1L, 10) ++ rows("y", 2L, 40)).toDF("a", "b")
    val g = EvalOps.gTest(df, "a", "b").collect()(0).getLong(5)
    val chi = EvalOps.chiSquareIndependence(df, "a", "b")
      .collect()(0).getLong(4)
    // classic result: G tracks χ² (here G = 38.55 vs χ² = 36.0 —
    // G runs above Pearson as the association strengthens)
    assert(math.abs(g - chi).toDouble / chi < 0.10)
    assert(g > chi)
  }

  test("gTest is partition-invariant") {
    val df = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L),
      ("y", 2L), ("x", 1L)).toDF("a", "b")
    def run(d: DataFrame) =
      EvalOps.gTest(d, "a", "b").collect().toSeq
    assert(run(df.repartition(5)) === run(df.coalesce(1)))
  }
}
