package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EvalOps

/** CEM covariate balance + Nelson–Aalen hazard (round 14, batch I). */
class Round14BalanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ----- cemBalance -----------------------------------------------

  /** Stratum 1: treated x = {10} vs control x = {6, 8}; stratum 2:
    * treated x = {20}, NO control. Unadjusted means 15 vs 7 (SMD
    * large); matched (stratum 1 only) treated mean 10 vs weighted
    * control 7 — balance improves. */
  private def balFixture(): DataFrame =
    Seq((1L, true, 10L), (1L, false, 6L), (1L, false, 8L),
      (2L, true, 20L)).toDF("stratum", "treat", "x")

  test("cemBalance: hand-computed before/after SMDs; matching " +
       "shrinks the imbalance") {
    val r = EvalOps.cemBalance(balFixture(), "stratum", "treat", "x")
      .collect()(0)
    assert((0 to 2).map(r.getLong) === Seq(2L, 2L, 1L))
    assert(r.getLong(3) === 15000000L) // mean_t
    assert(r.getLong(4) === 7000000L) // mean_c
    // vt = (500 − 450)/1 = 50; vc = (100 − 98)/1 = 2; pooled = √26
    val pooled = math.sqrt((50.0 + 2.0) / 2.0)
    assert(r.getLong(5) === math.round((15.0 - 7.0) / pooled * 1e6))
    // after: treated (matched) mean 10; weighted control
    // smc6 = round(1·14/2·1e6) = 7e6 → mean 7
    assert(r.getLong(6) ===
      math.round((10.0 - 7000000.0 / 1e6 / 1.0) / pooled * 1e6))
    assert(math.abs(r.getLong(6)) < math.abs(r.getLong(5)))
  }

  test("cemBalance: singleton sides → null SMDs without tripping " +
       "the ANSI zero-division; means intact") {
    val df = Seq((1L, true, 5L), (1L, false, 3L))
      .toDF("stratum", "treat", "x")
    val r = EvalOps.cemBalance(df, "stratum", "treat", "x")
      .collect()(0)
    assert(r.getLong(3) === 5000000L && r.getLong(4) === 3000000L)
    assert(r.isNullAt(5) && r.isNullAt(6))
  }

  test("cemBalance: no matched stratum → null after-SMD, before " +
       "intact") {
    val df = Seq((1L, true, 4L), (1L, true, 8L),
      (2L, false, 1L), (2L, false, 3L)).toDF("stratum", "treat", "x")
    val r = EvalOps.cemBalance(df, "stratum", "treat", "x")
      .collect()(0)
    assert(!r.isNullAt(5))
    assert(r.isNullAt(6))
  }

  test("cemBalance is partition-invariant") {
    def run(d: DataFrame) =
      EvalOps.cemBalance(d, "stratum", "treat", "x").collect().toSeq
    assert(run(balFixture().repartition(5)) ===
      run(balFixture().coalesce(1)))
  }

  // ----- nelsonAalen ----------------------------------------------

  test("nelsonAalen: hand-computed at-risk, hazard, and cumulative " +
       "hazard; censoring-only levels carry zero hazard") {
    // durations: 1(event), 1(event), 2(censored), 3(event)
    val df = Seq((1L, true), (1L, true), (2L, false), (3L, true))
      .toDF("dur", "event")
    val rows = EvalOps.nelsonAalen(df, "dur", "event")
      .orderBy("t").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(_.getLong(1)).toSeq === Seq(4L, 2L, 1L))
    assert(rows.map(_.getLong(2)).toSeq === Seq(2L, 0L, 1L))
    assert(rows.map(_.getLong(3)).toSeq ===
      Seq(500000L, 0L, 1000000L))
    assert(rows.map(_.getLong(4)).toSeq ===
      Seq(500000L, 500000L, 1500000L))
  }

  test("nelsonAalen: all censored → zero hazard everywhere") {
    val df = Seq((1L, false), (5L, false)).toDF("dur", "event")
    val rows = EvalOps.nelsonAalen(df, "dur", "event").collect()
    assert(rows.forall(_.getLong(3) === 0L))
    assert(rows.forall(_.getLong(4) === 0L))
  }

  test("nelsonAalen: cumulative hazard is non-decreasing") {
    val df = Seq((1L, true), (2L, true), (2L, false), (4L, true),
      (5L, false), (6L, true)).toDF("dur", "event")
    val cum = EvalOps.nelsonAalen(df, "dur", "event")
      .orderBy("t").collect().map(_.getLong(4)).toSeq
    assert(cum === cum.sorted)
  }

  test("nelsonAalen is partition-invariant") {
    val df = Seq((1L, true), (2L, false), (3L, true), (3L, true))
      .toDF("dur", "event")
    def run(d: DataFrame) =
      EvalOps.nelsonAalen(d, "dur", "event").orderBy("t")
        .collect().toSeq
    assert(run(df.repartition(6)) === run(df.coalesce(1)))
  }
}
