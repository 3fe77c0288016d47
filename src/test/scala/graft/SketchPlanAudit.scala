package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the BASELINE.md round-13 session-3 claims:
  * the CMS probe join broadcasts the d·w cell table, every sketch
  * aggregate keeps map-side partial aggregation, and the conformal
  * loop joins its model/quantile tables by broadcast (nothing
  * data-sized sorts). */
class SketchPlanAudit extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q294 plan: CMS cell table BROADCASTS onto the probe side " +
       "and the sketch aggregate is map-side partial") {
    val p = SparkEntry.queries("q294_count_min")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("partial_"), p.take(2000))
  }

  test("q296 plan: the conformal model and quantile tables ride " +
       "broadcast joins — the test/cal scans never sort-merge") {
    val p = SparkEntry.queries("q296_conformal")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }
}
