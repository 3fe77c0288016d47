package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EvalOps

/** Round-18 serve→monitor units (round-17 verdict task 5): the
  * score-drift KS alarm over model margins — an injected covariate
  * shift on the served side must trip `reject`, an identically
  * distributed serve must not. The oracled q419 carries the DuckDB
  * hash check of the full fit→score→monitor chain. */
class Round18DriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val (b0, b1, b2) = (100L, 5000L, -3000L)
  private def score(x1: Long, x2: Long): Long = b0 + x1 * b1 + x2 * b2

  test("an injected covariate shift on the served slice trips the " +
       "margin-KS alarm") {
    val train = (0 until 500).map(i =>
      (score((i % 50) + 1L, i % 11L), true))
    val served = (0 until 500).map(i =>
      (score((i % 50) + 21L, i % 11L), false)) // x1 shifted +20
    val r = EvalOps.ksTest((train ++ served).toDF("score", "is_train"),
      "score", "is_train").collect().head
    assert(r.getAs[Boolean]("reject"),
      s"shifted serve must trip: d_ppm=${r.getAs[Long]("d_ppm")} " +
        s"crit_ppm=${r.getAs[Long]("crit_ppm")}")
  }

  test("an identically distributed serve does NOT trip the alarm " +
       "(D = 0 on the same margin multiset)") {
    val train = (0 until 500).map(i =>
      (score((i % 50) + 1L, i % 11L), true))
    val served = (0 until 500).map(i =>
      (score((i % 50) + 1L, i % 11L), false))
    val r = EvalOps.ksTest((train ++ served).toDF("score", "is_train"),
      "score", "is_train").collect().head
    assert(r.getAs[Long]("d_ppm") === 0L)
    assert(!r.getAs[Boolean]("reject"))
  }
}
