package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EvalOps

/** Causal-inference family (round 14, batch 2): coarsened exact
  * matching ATT, Mantel–Haenszel stratified OR + CMH χ², and
  * difference-in-differences — hand-computed fixtures, degenerate
  * guards, partition invariance.
  */
class Round14CausalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ----- cemAtt ---------------------------------------------------

  /** Stratum 1: treated {10, 20} vs control {5} → diff +10.
    * Stratum 2: treated {100}, NO control → unmatched.
    * Stratum 3: treated {1} vs control {4, 8} → diff −5.
    * ATT = (2·10 + 1·(−5)) / 3 = +5. */
  private def cemFixture(): DataFrame =
    Seq((1L, true, 10L), (1L, true, 20L), (1L, false, 5L),
      (2L, true, 100L),
      (3L, true, 1L), (3L, false, 4L), (3L, false, 8L))
      .toDF("stratum", "treat", "y")

  test("cemAtt: hand-computed strata, ATT, and matched share") {
    val rows = EvalOps.cemAtt(cemFixture(), "stratum", "treat", "y")
      .orderBy("stratum").collect()
    assert(rows.length === 3)
    val s1 = rows(0)
    assert(s1.getLong(1) === 2L && s1.getLong(2) === 1L) // n_t, n_c
    assert(s1.getBoolean(5)) // matched
    assert(s1.getLong(6) === 10000000L) // diff_micro
    val s2 = rows(1)
    assert(!s2.getBoolean(5) && s2.isNullAt(6)) // unmatched → null
    val s3 = rows(2)
    assert(s3.getLong(6) === -5000000L)
    // global columns repeat on every row
    rows.foreach { r =>
      assert(r.getLong(7) === 5000000L) // att_micro
      assert(r.getLong(8) === 3L) // n_t_matched
      assert(r.getLong(9) === 4L) // n_t_all
      assert(r.getLong(10) === 750000L) // matched_ppm
    }
  }

  test("cemAtt: negative ATT truncates toward zero (div semantics)") {
    // stratum 1: diff −1e6 micro (weight 1); stratum 2: diff 0
    // (weight 3) → num = −1e6, att = trunc(−1e6 / 4) = −250000
    // (floor semantics would also give −250000 here, so add the
    // asymmetric case: num = −1e6 over 3 treated → trunc −333333,
    // floor −333334 — the assert pins truncation).
    val att = EvalOps.cemAtt(
      Seq((1L, true, -1L), (1L, false, 0L),
        (2L, true, 0L), (2L, true, 0L), (2L, false, 0L))
        .toDF("stratum", "treat", "y"),
      "stratum", "treat", "y")
      .select("att_micro").distinct().collect()
    assert(att.map(_.getLong(0)).toSeq === Seq(-333333L))
  }

  test("cemAtt: no matched stratum → null ATT, matched_ppm 0") {
    val df = Seq((1L, true, 5L), (2L, false, 3L))
      .toDF("stratum", "treat", "y")
    val r = EvalOps.cemAtt(df, "stratum", "treat", "y").collect()
    assert(r.forall(_.isNullAt(7)))
    assert(r.forall(_.getLong(10) === 0L))
  }

  test("cemAtt is partition-invariant") {
    def run(d: DataFrame) =
      EvalOps.cemAtt(d, "stratum", "treat", "y")
        .orderBy("stratum").collect().toSeq
    assert(run(cemFixture().repartition(7)) ===
      run(cemFixture().coalesce(1)))
  }

  // ----- mantelHaenszel -------------------------------------------

  /** Stratum 1: a=3 b=1 c=2 d=4 (n=10); stratum 2: a=1 b=2 c=1 d=1
    * (n=5). By hand: r-terms 1.2 + 0.2, s-terms 0.2 + 0.4 →
    * OR = 1.4/0.6; E 2.0 + 1.2; V 600/900 + 36/100. */
  private def mhFixture(): DataFrame = {
    def rows(s: Long, t: Boolean, o: Boolean, k: Int) =
      Seq.fill(k)((s, t, o))
    (rows(1L, true, true, 3) ++ rows(1L, true, false, 1) ++
      rows(1L, false, true, 2) ++ rows(1L, false, false, 4) ++
      rows(2L, true, true, 1) ++ rows(2L, true, false, 2) ++
      rows(2L, false, true, 1) ++ rows(2L, false, false, 1))
      .toDF("stratum", "treat", "outcome")
  }

  test("mantelHaenszel: hand-computed pooled OR and CMH χ²") {
    val r = EvalOps.mantelHaenszel(mhFixture(), "stratum", "treat",
      "outcome").collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getLong(0) === 2L) // k_strata
    assert(row.getLong(1) === 15L) // n
    assert(row.getLong(2) === 4L) // sum_a
    // sr = 1,200,000 + 200,000; ss = 200,000 + 400,000 — the same
    // double spelling the op uses
    val orMicro = math.round(1400000.0 / 600000.0 * 1e6)
    assert(row.getLong(3) === orMicro)
    // se = 2,000,000 + 1,200,000; sv = 666,667 + 360,000
    val se = 3200000.0; val sv = 1026667.0
    val chi2 = math.round((4.0 - se / 1e6) * (4.0 - se / 1e6) /
      (sv / 1e6) * 1e6)
    assert(row.getLong(4) === chi2)
  }

  test("mantelHaenszel: single-row strata are excluded; degenerate " +
       "denominator → null OR") {
    // stratum 1 has one row (excluded); stratum 2 has b=0, c>0 —
    // wait, null OR needs Σ(b·c/n)=0: make every stratum b·c = 0
    val df = Seq((1L, true, true),
      (2L, true, true), (2L, true, true), (2L, false, false))
      .toDF("stratum", "treat", "outcome")
    val row = EvalOps.mantelHaenszel(df, "stratum", "treat",
      "outcome").collect()(0)
    assert(row.getLong(0) === 1L) // only stratum 2 kept
    assert(row.getLong(1) === 3L)
    assert(row.isNullAt(3)) // b=1,c=0 → ss=0 → null OR
  }

  test("mantelHaenszel is partition-invariant") {
    def run(d: DataFrame) =
      EvalOps.mantelHaenszel(d, "stratum", "treat", "outcome")
        .collect().toSeq
    assert(run(mhFixture().repartition(5)) ===
      run(mhFixture().coalesce(1)))
  }

  // ----- diffInDiff -----------------------------------------------

  /** t,pre {10}; t,post {30, 10}; c,pre {4}; c,post {6, 2}.
    * pre-gap = 10 − 4 = 6; DiD = (20 − 10) − (4 − 4) = 10. */
  private def didFixture(): DataFrame =
    Seq((true, false, 10L), (true, true, 30L), (true, true, 10L),
      (false, false, 4L), (false, true, 6L), (false, true, 2L))
      .toDF("treat", "post", "y")

  test("diffInDiff: hand-computed cells, pre-gap, and DiD") {
    val row = EvalOps.diffInDiff(didFixture(), "treat", "post", "y")
      .collect()(0)
    assert((0 to 3).map(row.getLong) === Seq(1L, 2L, 1L, 2L))
    assert((4 to 7).map(row.getLong) === Seq(10L, 40L, 4L, 8L))
    assert(row.getLong(8) === 6000000L)
    assert(row.getLong(9) === 10000000L)
  }

  test("diffInDiff: an empty cell nulls the estimate, not the counts") {
    val df = Seq((true, true, 5L), (false, false, 1L),
      (false, true, 2L)).toDF("treat", "post", "y")
    val row = EvalOps.diffInDiff(df, "treat", "post", "y").collect()(0)
    assert(row.getLong(0) === 0L) // n_t_pre empty
    assert(row.isNullAt(8) && row.isNullAt(9))
  }

  test("diffInDiff is partition-invariant") {
    def run(d: DataFrame) =
      EvalOps.diffInDiff(d, "treat", "post", "y").collect().toSeq
    assert(run(didFixture().repartition(4)) ===
      run(didFixture().coalesce(1)))
  }
}
