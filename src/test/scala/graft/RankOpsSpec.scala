package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AggOps

/** Distributed exact-rank primitive and its consumers (Spearman rank
  * correlation, equi-depth binning) — checked against naive in-memory
  * references, with ties, negatives, and varied partitioning. */
class RankOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("valueRanks: cnt/below match the naive computation across " +
       "ties, negatives, partitionings, and bucket widths") {
    val vals = Seq(5L, -3L, 5L, 0L, -3L, 12L, -3L, 0L, 7L)
    val expect = vals.distinct.map { v =>
      (v, vals.count(_ == v).toLong, vals.count(_ < v).toLong)
    }.toSet
    for (parts <- Seq(1, 5); shift <- Seq(2, 32)) {
      val got = AggOps.valueRanks(
          vals.toDF("v").repartition(parts), "v", bucketShift = shift)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got === expect, s"parts=$parts shift=$shift")
    }
  }

  /** Naive Spearman with average-tie ranks (the textbook formula). */
  private def naiveSpearman(xs: Seq[Long], ys: Seq[Long]): Double = {
    def avgRanks(v: Seq[Long]): Seq[Double] =
      v.map(x => v.count(_ < x) + (v.count(_ == x) + 1) / 2.0)
    val (rx, ry) = (avgRanks(xs), avgRanks(ys))
    val (mx, my) = (rx.sum / rx.size, ry.sum / ry.size)
    val num = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val den = math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum) *
      math.sqrt(ry.map(b => (b - my) * (b - my)).sum)
    num / den
  }

  test("spearman: monotone ±1, tie case matches the naive formula, " +
       "constant column yields null") {
    val mono = Seq((1L, 10L), (2L, 20L), (3L, 25L), (4L, 99L))
    assert(AggOps.spearman(mono.toDF("x", "y"), "x", "y")
      .collect()(0).getAs[Double]("rho") === 1.0)
    val inv = mono.map { case (a, b) => (a, -b) }
    assert(AggOps.spearman(inv.toDF("x", "y"), "x", "y")
      .collect()(0).getAs[Double]("rho") === -1.0)
    // ties on both sides, non-monotone
    val xs = Seq(1L, 2L, 2L, 3L, 3L, 3L, 9L)
    val ys = Seq(4L, 4L, 7L, 5L, 5L, 9L, 1L)
    val got = AggOps.spearman(xs.zip(ys).toDF("x", "y"), "x", "y")
      .collect()(0)
    assert(got.getAs[Long]("n") === 7L)
    assert(got.getAs[Double]("rho") ===
      math.rint(naiveSpearman(xs, ys) * 1e6) / 1e6)
    val const = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    assert(AggOps.spearman(const, "x", "y").collect()(0)
      .isNullAt(1))
  }

  test("equiDepthBins: tie groups never split, populations balance, " +
       "ranges partition the domain") {
    // 12 values with a 4-way tie at 50 that would straddle a third cut
    val vals = Seq(10L, 20L, 30L, 40L, 50L, 50L, 50L, 50L,
      60L, 70L, 80L, 90L)
    val got = AggOps.equiDepthBins(vals.toDF("v"), "v", bins = 3)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // below·3 div 12: 10..40 → bins 0; the 50-tie (below=4) → bin 1
    // as ONE group; 60.. (below=8,9,10,11) → bins 2
    assert(got === Array(
      (0L, 4L, 10L, 40L), (1L, 4L, 50L, 50L), (2L, 4L, 60L, 90L)))
    assert(got.map(_._2).sum === vals.size)
  }
}
