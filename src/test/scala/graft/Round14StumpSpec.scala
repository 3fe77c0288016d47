package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, EvalOps}

/** Decision-stump gain + Wilson intervals (round 14, batch G). */
class Round14StumpSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ----- decisionStumpGain ----------------------------------------

  /** Perfectly separable: y = false at v ∈ {1, 2}, y = true at
    * v ∈ {3, 4}. Splitting at t = 2 yields pure children →
    * gain = H(parent) = ln 2; the last level (4) is excluded. */
  private def sepFixture(): DataFrame =
    Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("v", "y")

  test("decisionStumpGain: the separating threshold earns the full " +
       "parent entropy and wins best") {
    val rows = AggOps.decisionStumpGain(sepFixture(), "v", "y")
      .orderBy("threshold").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val best = rows.filter(_.getBoolean(4))
    assert(best.length === 1)
    assert(best(0).getLong(0) === 2L)
    assert(best(0).getLong(1) === 2L && best(0).getLong(2) === 2L)
    assert(best(0).getLong(3) === math.round(math.log(2.0) * 1e9))
    // non-separating splits earn strictly less
    rows.filterNot(_.getBoolean(4)).foreach { r =>
      assert(r.getLong(3) < best(0).getLong(3))
    }
  }

  test("decisionStumpGain: a pure parent has zero gain everywhere; " +
       "ties pick the smallest threshold") {
    val df = Seq((1L, true), (2L, true), (3L, true)).toDF("v", "y")
    val rows = AggOps.decisionStumpGain(df, "v", "y")
      .orderBy("threshold").collect()
    assert(rows.forall(_.getLong(3) === 0L))
    assert(rows.count(_.getBoolean(4)) === 1)
    assert(rows.find(_.getBoolean(4)).get.getLong(0) === 1L)
  }

  test("decisionStumpGain: hand-computed mixed split") {
    // v=1: (1 true, 1 false); v=2: (1 true, 0 false).
    // Split at 1: left (1,1) H=ln2, right (1,0) H=0, parent
    // (2 true, 1 false): H = −(2/3 ln 2/3 + 1/3 ln 1/3).
    // gain = Hp − (2/3)·ln2
    val df = Seq((1L, true), (1L, false), (2L, true)).toDF("v", "y")
    val rows = AggOps.decisionStumpGain(df, "v", "y").collect()
    assert(rows.length === 1)
    val hp = -(2.0 / 3.0 * math.log(2.0 / 3.0) +
      1.0 / 3.0 * math.log(1.0 / 3.0))
    val expected = math.round((hp -
      2.0 / 3.0 * (-(0.5 * math.log(0.5) + 0.5 * math.log(0.5))) -
      1.0 / 3.0 * 0.0) * 1e9)
    assert(rows(0).getLong(3) === expected)
  }

  test("decisionStumpGain is partition-invariant") {
    def run(d: DataFrame) =
      AggOps.decisionStumpGain(d, "v", "y").orderBy("threshold")
        .collect().toSeq
    assert(run(sepFixture().repartition(7)) ===
      run(sepFixture().coalesce(1)))
  }

  // ----- wilsonInterval -------------------------------------------

  test("wilsonInterval: hand-replayed bounds bracket the rate and " +
       "stay inside [0, 1] at the extremes") {
    val df = Seq(("a", true), ("a", false), ("a", false), ("a", true),
      ("b", true), ("b", true), ("c", false)).toDF("g", "c")
    val rows = EvalOps.wilsonInterval(df, "g", "c", 1.959964)
      .orderBy("grp").collect()
    val z = 1.959964; val z2 = z * z
    def bounds(n: Long, x: Long): (Long, Long) = {
      val p = x.toDouble / n
      val denom = 1.0 + z2 / n
      val center = (p + z2 / (2.0 * n)) / denom
      val half = z * math.sqrt(p * (1.0 - p) / n +
        z2 / (4.0 * n.toDouble * n)) / denom
      (math.round((center - half) * 1e6),
        math.round((center + half) * 1e6))
    }
    val a = rows(0)
    assert((a.getLong(4), a.getLong(5)) === bounds(4, 2))
    // all-success group: upper pinned near 1, lower well above 0
    val b = rows(1)
    assert((b.getLong(4), b.getLong(5)) === bounds(2, 2))
    assert(b.getLong(5) <= 1000000L && b.getLong(4) > 0L)
    // all-failure group: lower 0-ish, upper below 1
    val c = rows(2)
    assert((c.getLong(4), c.getLong(5)) === bounds(1, 0))
    assert(c.getLong(4) === 0L && c.getLong(5) < 1000000L)
  }

  test("wilsonInterval: wider at small n, narrower at large n") {
    val small = (1 to 10).map(i => ("g", i <= 3))
    val large = (1 to 1000).map(i => ("g", i <= 300))
    def width(rows: Seq[(String, Boolean)]): Long = {
      val r = EvalOps.wilsonInterval(rows.toDF("g", "c"), "g", "c",
        1.959964).collect()(0)
      r.getLong(5) - r.getLong(4)
    }
    assert(width(small) > 3 * width(large))
  }

  test("wilsonInterval is partition-invariant") {
    val df = (1 to 100).map(i => (s"g${i % 3}", i % 5 == 0))
      .toDF("g", "c")
    def run(d: DataFrame) =
      EvalOps.wilsonInterval(d, "g", "c", 1.959964)
        .orderBy("grp").collect().toSeq
    assert(run(df.repartition(9)) === run(df.coalesce(1)))
  }
}
