package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AggOps

/** Round-17 AdaBoost units: a hand-computed boosting round (weights,
  * error, α), the reweighting driving round 2 to the previously
  * misclassified region, the degenerate perfect-stump freeze, and
  * the verdict's asked property — boosting beats the best single
  * stump on a fixture one threshold cannot separate. The oracled
  * q400 carries the DuckDB hash check. */
class Round17BoostSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-computed round 1 and the reweighted round 2: the tie " +
       "rule picks the smallest threshold, alpha = ln(3)/2 micro, " +
       "round 2 moves to the misclassified level") {
    val df = Seq((1L, true), (2L, false), (3L, true), (4L, false))
      .toDF("x", "y")
    val rounds = AggOps.adaBoostStumps(df, "x", "y", rounds = 2)
      .orderBy("round").collect()
    // round 1: min werr = 1e6 at (thr=1,+1) and (thr=3,+1); tie ->
    // thr 1. alpha = 0.5*ln(3e6/1e6) = 549306 micro
    assert(rounds(0).getLong(1) === 1L)   // threshold
    assert(rounds(0).getLong(2) === 1L)   // polarity
    assert(rounds(0).getLong(3) === 1000000L) // werr_micro
    assert(rounds(0).getLong(4) === 4000000L) // wtot_micro
    assert(rounds(0).getLong(5) === 549306L)  // alpha_micro
    // round 2: the x=3 row (wrongly predicted false) now carries
    // weight sqrt(3)e6 and the best stump moves to thr=3, +1
    assert(rounds(1).getLong(1) === 3L)
    assert(rounds(1).getLong(2) === 1L)
    assert(rounds(1).getLong(5) > 0L)
  }

  test("a perfectly separable fixture freezes: werr 0, alpha 0, and " +
       "subsequent rounds replay the same stump") {
    val df = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("x", "y")
    val rounds = AggOps.adaBoostStumps(df, "x", "y", rounds = 3)
      .orderBy("round").collect()
    rounds.foreach { r =>
      assert(r.getLong(1) === 2L && r.getLong(2) === 1L)
      assert(r.getLong(3) === 0L && r.getLong(5) === 0L)
    }
  }

  test("boosting beats the best single stump on an interval concept " +
       "(y = x in [10,20) needs two thresholds)") {
    val rows = (0 until 30).map(x => (x.toLong, x >= 10 && x < 20))
    val df = rows.toDF("x", "y")
    val table = AggOps.adaBoostStumps(df, "x", "y", rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(5))).toSeq
    // the best SINGLE stump gets 20/30 (one boundary wrong)
    val singleBestCorrect = 20
    val pred = df.withColumn("_p",
      AggOps.adaBoostPredExpr(col("x"), table))
    val correct = pred.where(col("_p") === col("y")).count()
    assert(correct > singleBestCorrect,
      s"3-round ensemble must beat the single stump: $correct/30")
    intercept[IllegalArgumentException] {
      AggOps.adaBoostPredExpr(col("x"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      AggOps.adaBoostStumps(df, "x", "y", rounds = 0)
    }
  }
}
