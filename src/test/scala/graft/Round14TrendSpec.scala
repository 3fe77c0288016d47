package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, EvalOps}

/** Trend + sequential-testing family (round 14, batch C):
  * Mann–Kendall, Theil–Sen, Wald SPRT — hand-computed fixtures,
  * degenerate guards, partition invariance.
  */
class Round14TrendSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ----- mannKendall ----------------------------------------------

  test("mannKendall: strictly increasing series → S = n(n−1)/2, " +
       "z replayed at the op's spelling") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("a", 4L, 40L)).toDF("g", "t", "v")
    val r = AggOps.mannKendall(df, "g", "t", "v").collect()(0)
    assert(r.getLong(1) === 4L) // n
    assert(r.getLong(2) === 6L) // S
    assert(r.getLong(3) === 156L) // var18 = 4·3·13
    val z = math.round(5.0 / math.sqrt(156.0 / 18.0) * 1e6)
    assert(r.getLong(4) === z)
  }

  test("mannKendall: decreasing series is antisymmetric") {
    val inc = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L))
      .toDF("g", "t", "v")
    val dec = Seq(("a", 1L, 3L), ("a", 2L, 2L), ("a", 3L, 1L))
      .toDF("g", "t", "v")
    val ri = AggOps.mannKendall(inc, "g", "t", "v").collect()(0)
    val rd = AggOps.mannKendall(dec, "g", "t", "v").collect()(0)
    assert(ri.getLong(2) === 3L && rd.getLong(2) === -3L)
    assert(ri.getLong(4) === -rd.getLong(4))
  }

  test("mannKendall: ties reduce var18; S counts only strict moves") {
    // {1, 1, 2}: S = 0 + 1 + 1 = 2; tie mass 2·1·9 = 18;
    // var18 = 3·2·11 − 18 = 48; z = 1/√(48/18)
    val df = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 2L))
      .toDF("g", "t", "v")
    val r = AggOps.mannKendall(df, "g", "t", "v").collect()(0)
    assert(r.getLong(2) === 2L)
    assert(r.getLong(3) === 48L)
    assert(r.getLong(4) ===
      math.round(1.0 / math.sqrt(48.0 / 18.0) * 1e6))
  }

  test("mannKendall: constant series and singletons → null z") {
    val df = Seq(("c", 1L, 7L), ("c", 2L, 7L), ("s", 9L, 1L))
      .toDF("g", "t", "v")
    val rows = AggOps.mannKendall(df, "g", "t", "v")
      .orderBy("grp").collect()
    assert(rows(0).getLong(2) === 0L && rows(0).isNullAt(4))
    assert(rows(1).getLong(1) === 1L && rows(1).isNullAt(4))
  }

  test("mannKendall is partition-invariant") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, 9L), ("a", 3L, 2L),
      ("b", 1L, 1L), ("b", 2L, 1L)).toDF("g", "t", "v")
    def run(d: DataFrame) =
      AggOps.mannKendall(d, "g", "t", "v").orderBy("grp")
        .collect().toSeq
    assert(run(df.repartition(7)) === run(df.coalesce(1)))
  }

  // ----- theilSen -------------------------------------------------

  test("theilSen: hand-computed lower median of pairwise slopes") {
    // (0,0), (1,2), (2,8): slopes 2, 4, 6 → lower median rank
    // (3+1) div 2 = 2 → 4 units = 4e6 micro
    val df = Seq(("a", 0L, 0L), ("a", 1L, 2L), ("a", 2L, 8L))
      .toDF("g", "t", "v")
    val r = AggOps.theilSen(df, "g", "t", "v").collect()(0)
    assert(r.getLong(1) === 3L) // n_points
    assert(r.getLong(2) === 3L) // n_pairs
    assert(r.getLong(3) === 4000000L)
  }

  test("theilSen: negative slope truncates toward zero") {
    // (0,5), (3,1): slope = −4e6 div 3 = −1333333 (floor −1333334)
    val df = Seq(("a", 0L, 5L), ("a", 3L, 1L)).toDF("g", "t", "v")
    val r = AggOps.theilSen(df, "g", "t", "v").collect()(0)
    assert(r.getLong(3) === -1333333L)
  }

  test("theilSen: even pair count picks the lower median; " +
       "singleton group surfaces with 0 pairs and null slope") {
    // (0,0),(1,1),(2,4): slopes 1, 2, 3... need 4 pairs: add (3,3):
    // slopes (0→1)=1e6, (0→2)=2e6, (0→3)=1e6, (1→2)=3e6, (1→3)=1e6,
    // (2→3)=−1e6 → 6 pairs sorted: −1e6,1e6,1e6,1e6,2e6,3e6 →
    // rank (6+1) div 2 = 3 → 1e6
    val df = Seq(("a", 0L, 0L), ("a", 1L, 1L), ("a", 2L, 4L),
      ("a", 3L, 3L), ("lone", 5L, 5L)).toDF("g", "t", "v")
    val rows = AggOps.theilSen(df, "g", "t", "v").orderBy("grp")
      .collect()
    assert(rows(0).getLong(2) === 6L)
    assert(rows(0).getLong(3) === 1000000L)
    assert(rows(1).getLong(2) === 0L && rows(1).isNullAt(3))
  }

  test("theilSen is partition-invariant") {
    val df = Seq(("a", 0L, 0L), ("a", 1L, 2L), ("a", 2L, 8L),
      ("b", 0L, 9L), ("b", 2L, 3L)).toDF("g", "t", "v")
    def run(d: DataFrame) =
      AggOps.theilSen(d, "g", "t", "v").orderBy("grp")
        .collect().toSeq
    assert(run(df.repartition(5)) === run(df.coalesce(1)))
  }

  // ----- sprtBernoulli --------------------------------------------

  test("sprtBernoulli: p0=0.2 vs p1=0.8 decides H1 after two " +
       "successes on day one") {
    // l1 = ln(4)·1e9, l0 = −ln(4)·1e9; bounds ±ln(9)·1e9.
    // day1: 2/2 → llr = 2·l1 = 2.772e9 ≥ 2.197e9 → accept_h1
    val df = Seq(("d1", true), ("d1", true), ("d2", false))
      .toDF("day", "conv")
    val rows = EvalOps.sprtBernoulli(df, "day", "conv",
      0.2, 0.8, 0.1, 0.1).orderBy("t").collect()
    val (l1, l0) = EvalOps.sprtIncrementsNano(0.2, 0.8)
    assert(rows(0).getLong(5) === 2 * l1)
    assert(rows(0).getString(6) === "accept_h1")
    // day2 cumulative: 2 successes + 1 failure
    assert(rows(1).getLong(5) === 2 * l1 + l0)
    assert(l0 === -l1) // symmetric hypotheses
  }

  test("sprtBernoulli: a failure run decides H0; middling evidence " +
       "continues") {
    val df = Seq(("d1", false), ("d1", false), ("d2", true))
      .toDF("day", "conv")
    val rows = EvalOps.sprtBernoulli(df, "day", "conv",
      0.2, 0.8, 0.1, 0.1).orderBy("t").collect()
    assert(rows(0).getString(6) === "accept_h0") // 2·l0 ≤ −ln(9)·1e9
    assert(rows(1).getString(6) === "continue") // back inside bounds
  }

  test("sprtBernoulli: degenerate hypotheses are rejected loudly") {
    val df = Seq(("d1", true)).toDF("day", "conv")
    intercept[IllegalArgumentException] {
      EvalOps.sprtBernoulli(df, "day", "conv", 0.3, 0.3, 0.1, 0.1)
    }
    intercept[IllegalArgumentException] {
      EvalOps.sprtBernoulli(df, "day", "conv", 0.2, 0.8, 0.0, 0.1)
    }
  }

  test("sprtBernoulli is partition-invariant") {
    val df = Seq(("d1", true), ("d1", false), ("d2", true),
      ("d3", false), ("d3", true)).toDF("day", "conv")
    def run(d: DataFrame) =
      EvalOps.sprtBernoulli(d, "day", "conv", 0.15, 0.2, 0.05, 0.05)
        .orderBy("t").collect().toSeq
    assert(run(df.repartition(6)) === run(df.coalesce(1)))
  }
}
