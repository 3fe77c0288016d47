package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, CleanOps}

/** l-diversity auditing and Jensen–Shannon drift — hand-computed
  * cases plus the JSD boundary identities (0 for identical
  * distributions, ln 2 for disjoint support). */
class PrivacyDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("lDiversityAudit flags homogeneous QI groups that k-anonymity " +
       "would pass") {
    // group (a, 1): 3 rows but ONE sensitive value — k=3-anonymous
    // yet 1-diverse; group (b, 2): 3 rows, 3 sensitive values
    val df = Seq(
      ("a", 1, 100L), ("a", 1, 100L), ("a", 1, 100L),
      ("b", 2, 100L), ("b", 2, 200L), ("b", 2, 300L)
    ).toDF("seg", "nat", "sens")
    val got = CleanOps.lDiversityAudit(df, Seq("seg", "nat"), "sens",
        l = 2).orderBy("seg").collect()
    assert(got(0).getAs[Long]("n") === 3L)
    assert(got(0).getAs[Long]("n_sensitive") === 1L)
    assert(got(0).getAs[Boolean]("diverse") === false)
    assert(got(1).getAs[Long]("n_sensitive") === 3L)
    assert(got(1).getAs[Boolean]("diverse") === true)
  }

  test("jensenShannon: identical distributions give 0, disjoint " +
       "support gives ln 2, hand case matches the closed form") {
    val p = Seq((0, 30L), (1, 70L)).toDF("b", "n")
    assert(AggOps.jensenShannon(p, p, "b", "n")
      .collect()(0).getAs[Double]("jsd") === 0.0)
    val q = Seq((2, 10L), (3, 90L)).toDF("b", "n")
    val disjoint = AggOps.jensenShannon(p, q, "b", "n").collect()(0)
    assert(disjoint.getAs[Long]("n_buckets") === 4L)
    assert(disjoint.getAs[Double]("jsd") ===
      math.rint(math.log(2) * 1e6) / 1e6)
    // hand case: p = (.5, .5), q = (.25, .75); per-bucket micro terms
    val p2 = Seq((0, 2L), (1, 2L)).toDF("b", "n")
    val q2 = Seq((0, 1L), (1, 3L)).toDF("b", "n")
    def t(ps: Double, qs: Double): Long =
      math.round(ps * math.log(2 * ps / (ps + qs)) * 1e6)
    val expect = math.rint((
      t(0.5, 0.25) + t(0.5, 0.75) +     // p side
      t(0.25, 0.5) + t(0.75, 0.5)       // q side
    ).toDouble / 2e6 * 1e6) / 1e6
    assert(AggOps.jensenShannon(p2, q2, "b", "n")
      .collect()(0).getAs[Double]("jsd") === expect)
  }

  test("jensenShannon is symmetric and bounded by ln 2") {
    val p = Seq((0, 5L), (1, 15L), (2, 80L)).toDF("b", "n")
    val q = Seq((1, 50L), (2, 10L), (3, 40L)).toDF("b", "n")
    val ab = AggOps.jensenShannon(p, q, "b", "n")
      .collect()(0).getAs[Double]("jsd")
    val ba = AggOps.jensenShannon(q, p, "b", "n")
      .collect()(0).getAs[Double]("jsd")
    assert(ab === ba)
    assert(ab > 0.0 && ab <= math.log(2) + 1e-6)
  }
}
