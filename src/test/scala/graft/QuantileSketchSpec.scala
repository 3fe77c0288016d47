package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** QuantileSketchAgg invariants: exact-regime equivalence, weight
  * conservation, summary size, and the deterministic rank-error bound
  * — all under varied partitioning (merge trees). */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def summarize(vals: Seq[Long], capacity: Int,
                        parts: Int): Seq[(Long, Long)] =
    vals.toDF("v").repartition(parts)
      .agg(GraftFunctions.quantile_sketch(col("v"), capacity).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.value"), col("e.weight"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("exact regime: capacity >= n gives the exact sorted value/" +
       "count table under any partitioning") {
    val vals = Seq(5L, 1L, 5L, 9L, 1L, 1L, 7L, 5L)
    val expect = vals.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    for (parts <- Seq(1, 3, 8)) {
      assert(summarize(vals, 16, parts) === expect, s"parts=$parts")
    }
  }

  test("weight mass is conserved exactly through compactions and " +
       "merges; summary stays O(capacity * levels)") {
    val n = 5000
    val vals = (0 until n).map(i => ((i * 2654435761L) % 100000L))
    for (parts <- Seq(1, 7); k <- Seq(8, 32)) {
      val s = summarize(vals, k, parts)
      assert(s.map(_._2).sum === n.toLong, s"parts=$parts k=$k")
      // values strictly ascending (canonical form)
      assert(s.map(_._1) === s.map(_._1).sorted)
      val levels = math.ceil(
        math.log(2.0 * n / k) / math.log(2)).toInt + 1
      assert(s.size <= 2 * k * levels, s"size=${s.size} k=$k")
    }
  }

  test("rank error stays within the deterministic " +
       "levels * n/capacity bound at multiple probe points") {
    val n = 5000
    val vals = (0 until n).map(i => ((i * 2654435761L) % 100000L))
    val sortedTrue = vals.sorted
    for (parts <- Seq(1, 7); k <- Seq(32, 128)) {
      val s = summarize(vals, k, parts)
      val levels = math.ceil(
        math.log(2.0 * n / k) / math.log(2)).toInt + 1
      val bound = levels.toLong * n / k
      // probe the 1..99 percent true quantile values
      (1 to 99).foreach { p =>
        val x = sortedTrue((n * p / 100).min(n - 1))
        val trueRank = vals.count(_ < x).toLong
        val estRank = s.filter(_._1 < x).map(_._2).sum
        assert(math.abs(estRank - trueRank) <= bound,
          s"p=$p parts=$parts k=$k est=$estRank true=$trueRank " +
            s"bound=$bound")
      }
    }
  }

  test("nulls are skipped and an all-null / empty input gives an " +
       "empty summary") {
    val df = Seq[Option[Long]](None, Some(4L), None).toDF("v")
    val s = df.agg(GraftFunctions.quantile_sketch(col("v"), 4).as("s"))
      .select(size(col("s"))).collect()(0).getInt(0)
    assert(s === 1)
    val empty = Seq.empty[Long].toDF("v")
      .agg(GraftFunctions.quantile_sketch(col("v"), 4).as("s"))
      .select(size(col("s"))).collect()(0).getInt(0)
    assert(empty === 0)
  }
}
