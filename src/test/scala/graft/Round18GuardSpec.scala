package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, EvalOps}

/** Round-18 guard/convention pins from the round-17 verdict and
  * advice: the AdaBoost integer-weight absorbing state (finding 2),
  * the parameterized KS critical value (finding 4 — the bhAdjust
  * rational convention), and the l2BoostStumps single-level
  * degenerate (advice 4). */
class Round18GuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("adaBoostStumps: the documented zero-absorbing weight — a " +
       "repeatedly-correct row's integer weight reaches exactly 0, " +
       "leaves the weighted error forever, and a NON-separable " +
       "fixture then reads a 'perfect' stump (werr 0, alpha 0)") {
    // The interleaved concept cycles through three stumps
    // (thr 1/thr 3/thr 2), each round's ~22% error downweighting
    // every row by the net factor ~0.786 per 3-round cycle — so the
    // INTEGER mass decays geometrically until rows absorb at 0 one
    // by one (~round 55 here). The terminal state: werr = 0 and
    // alpha = 0 — a 'perfect' stump on a fixture no single stump
    // separates, with only ~3 micro of the original 4e6 mass alive.
    val df = Seq((1L, true), (2L, false), (3L, true), (4L, false))
      .toDF("x", "y")
    val t = AggOps.adaBoostStumps(df, "x", "y", rounds = 60)
      .orderBy("round").collect()
    // round 1: not separable — the best stump has real error
    assert(t.head.getLong(3) > 0L, "fixture must not be separable")
    // final round: absorbed rows are gone from the error mass
    assert(t.last.getLong(3) === 0L,
      "expected the absorbing state to zero the weighted error")
    assert(t.last.getLong(5) === 0L) // alpha frozen at 0
    // and the surviving integer mass is a vanishing residue
    assert(t.last.getLong(4) < 4000L,
      s"live mass ${t.last.getLong(4)} should be ~0 of 4e6")
  }

  test("ksTest cMicro: the alpha = 0.01 critical literal (1.628e6) " +
       "flips a borderline rejection that alpha = 0.05 makes, and " +
       "the default replays the 1.358 literal bit for bit") {
    // D = 0.21 at n=100 per side: between c(.05)=0.192 and
    // c(.01)=0.230 scaled by sqrt(200/10000) = 0.1414
    val rows = (0 until 100).map(i => (i.toLong, true)) ++
      (0 until 100).map(i => (i.toLong + 21L, false))
    val df = rows.toDF("v", "g")
    val r05 = EvalOps.ksTest(df, "v", "g").collect().head
    val r01 = EvalOps.ksTest(df, "v", "g", cMicro = 1628000L)
      .collect().head
    assert(r05.getAs[Long]("d_ppm") === 210000L)
    assert(r05.getAs[Boolean]("reject"))
    assert(!r01.getAs[Boolean]("reject"))
    assert(r01.getAs[Long]("crit_ppm") > r05.getAs[Long]("crit_ppm"))
    // explicit default == implicit default (q405's hash stability)
    val rDef = EvalOps.ksTest(df, "v", "g", cMicro = 1358000L)
      .collect().head
    assert(rDef === r05)
  }

  test("l2BoostStumps: a single-level frame has no admissible " +
       "split and returns the documented EMPTY round table") {
    val df = (1 to 8).map(_ => (5L, 3L)).toDF("x", "y")
    assert(AggOps.l2BoostStumps(df, "x", "y", rounds = 3).count()
      === 0L)
  }
}
