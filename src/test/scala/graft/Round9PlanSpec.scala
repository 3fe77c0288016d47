package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-9 session-3 queries: the distributed-rank
  * primitive must never degrade into an unpartitioned global window,
  * the calibration path must stay off sort-merge joins, and the
  * deterministic top-k cuts must stay heap based (TakeOrdered),
  * never a global sort. Window checks read the OPTIMIZED LOGICAL
  * plan (AQE hides the physical WindowExec until execution). */
class Round9PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def frame(q: String) = SparkEntry.queries(q)(spark, dir)

  /** Every window in the optimized plan partitions on something — an
    * empty partitionSpec is the global-sort-through-one-task shape
    * the two-level prefix sum exists to avoid. */
  private def assertAllWindowsPartitioned(q: String): Unit = {
    val wins = frame(q).queryExecution.optimizedPlan.collect {
      case w: LWindow => w
    }
    assert(wins.nonEmpty, s"$q: expected window operators in the plan")
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"$q: Window with EMPTY partitionSpec (global window):\n$w")
    }
  }

  test("q220 ROC-AUC: every window is bucket-partitioned — the rank " +
       "pass never serializes through one task") {
    assertAllWindowsPartitioned("q220_roc_auc")
  }

  test("q226 equi-depth: valueRanks windows are bucket-partitioned") {
    assertAllWindowsPartitioned("q226_equidepth_bins")
  }

  test("q230 RFM: all three rank passes keep partitioned windows") {
    assertAllWindowsPartitioned("q230_rfm_segments")
  }

  test("q221 calibration: never a sort-merge join — stats ride " +
       "broadcasts") {
    val p = frame("q221_calibration").queryExecution.executedPlan
      .toString
    assert(!p.contains("SortMergeJoin"),
      s"calibration should never sort-merge anything:\n${p.take(1500)}")
    assert(p.contains("Broadcast"),
      "stats/ece rows should ride a broadcast")
  }

  test("q222 DSIR: ratio table broadcasts; top-100 is TakeOrdered, " +
       "not a global sort") {
    val p = frame("q222_dsir_selection").queryExecution.executedPlan
      .toString
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.contains("Exchange rangepartitioning"),
      "top-k degraded to a global sort")
    assert(p.contains("BroadcastHashJoin"),
      "lambda table should broadcast into the scoring join")
  }

  test("q236 A-ES sample: weighted top-k is TakeOrdered over " +
       "scan-stage arithmetic") {
    val p = frame("q236_weighted_sample").queryExecution.executedPlan
      .toString
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.contains("Exchange rangepartitioning"),
      "A-ES cut degraded to a global sort")
  }
}
