package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AggOps

/** Round-18 depth-2 boosting units (round-17 verdict task 4): the
  * interval concept stumps provably cannot represent, the per-side
  * degenerate fallback, and the empty-table degenerate. The oracled
  * q418 carries the DuckDB hash check. */
class Round18BoostSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("depth-2 beats depth-1 on the interval concept and zeroes " +
       "the residual mass in ONE round (y = 100 on [10,20), two " +
       "thresholds — a single stump can represent at most one)") {
    val rows = (0L until 30L).map(x =>
      (x, if (x >= 10 && x < 20) 100L else 0L))
    val df = rows.toDF("x", "y")
    val d2 = AggOps.l2BoostTrees2(df, "x", "y", rounds = 1)
      .collect().head
    val d1 = AggOps.l2BoostStumps(df, "x", "y", rounds = 1)
      .collect().head
    assert(d2.getAs[Long]("sar_micro") === 0L,
      s"depth-2 should fit the interval exactly, sar = " +
        s"${d2.getAs[Long]("sar_micro")}")
    assert(d1.getAs[Long]("sar_micro") > 0L,
      "a single stump must NOT fit the interval")
    // the tree's three boundaries recover the concept: root at one
    // interval edge, a sub-split at the other
    val cuts = Set(d2.getAs[Long]("root_thr"),
      d2.getAs[Long]("left_thr"), d2.getAs[Long]("right_thr"))
    assert(cuts.contains(9L) && cuts.contains(19L),
      s"expected cuts at 9 and 19, got $cuts")
  }

  test("a side with a single level degrades to its side mean on " +
       "both leaves with a NULL sub-threshold") {
    // root must split at x=1 (only admissible boundary separating
    // the outlier); the left side {1} then has no sub-split
    val rows = Seq((1L, 1000L), (2L, 0L), (3L, 10L), (4L, 0L),
      (5L, 10L))
    val df = rows.toDF("x", "y")
    val r = AggOps.l2BoostTrees2(df, "x", "y", rounds = 1)
      .collect().head
    assert(r.getAs[Long]("root_thr") === 1L)
    assert(r.isNullAt(r.fieldIndex("left_thr")))
    assert(r.getAs[Long]("ll_micro") === r.getAs[Long]("lr_micro"))
    assert(r.getAs[Long]("ll_micro") === 1000L * 1000000L)
  }

  test("a single-level frame returns the documented EMPTY table") {
    val df = (1 to 6).map(_ => (4L, 9L)).toDF("x", "y")
    assert(AggOps.l2BoostTrees2(df, "x", "y", rounds = 2).count()
      === 0L)
  }

  test("residual trajectory: depth-2 sar is monotone <= depth-1 " +
       "sar round by round on the hour/cents shape") {
    val rows = (0 until 240).map { i =>
      val x = (i % 24).toLong
      (x, 100L + (if (x < 8) 50L else if (x < 16) -30L else 10L) +
        ((i * 7) % 11) - 5)
    }
    val df = rows.toDF("x", "y")
    val d2 = AggOps.l2BoostTrees2(df, "x", "y", rounds = 3)
      .orderBy("round").collect().map(_.getAs[Long]("sar_micro"))
    val d1 = AggOps.l2BoostStumps(df, "x", "y", rounds = 3)
      .orderBy("round").collect().map(_.getAs[Long]("sar_micro"))
    d2.zip(d1).foreach { case (a, b) =>
      assert(a <= b, s"depth-2 sar $a exceeded depth-1 sar $b") }
  }
}
