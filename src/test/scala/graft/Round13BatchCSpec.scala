package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, SketchOps}

/** Batch-C operators of round 13: KMV distinct/set-operation
  * sketches, the grouped Gram-sums + Cramer-solve refactor behind
  * the streaming ridge, and binary-segmentation changepoint. */
class Round13BatchCSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------- KMV ----------------

  test("kmvSketch: the k smallest hash values exactly (vs a full " +
       "sort), duplicate- and partition-invariant; an exhausted " +
       "sketch reports the EXACT count") {
    val keys = (1L to 500L).toDF("k")
    val sk = SketchOps.kmvSketch(
      keys.unionAll(keys).repartition(9), "k", 64)
    val manual = keys.select(
        conv(substring(md5(concat(lit("kmv|"), col("k"))), 1, 14),
          16, 10).cast("long").as("h"))
      .distinct().orderBy("h").limit(64).collect().map(_.getLong(0))
    assert(sk.orderBy("h").collect().map(_.getLong(0)).toSeq ===
      manual.toSeq)
    // n < k => exact count, micro-scaled
    val small = SketchOps.kmvEstimate(
      SketchOps.kmvSketch((1L to 40L).toDF("k"), "k", 64), 64).head()
    assert(small.getLong(0) === 40L && small.getLong(1) === 40000000L)
  }

  test("kmvEstimate: within ~4/sqrt(k) of the true cardinality at " +
       "k=256 over 5000 keys") {
    val est = SketchOps.kmvEstimate(
      SketchOps.kmvSketch((1L to 5000L).toDF("k"), "k", 256), 256)
      .head().getLong(1) / 1e6
    assert(math.abs(est - 5000) < 5000 * 0.25, s"KMV est $est vs 5000")
  }

  test("kmvSetEstimates: identical sets give jaccard exactly 1e6 " +
       "ppm with est_intersect = est_union; disjoint sets give " +
       "k_intersect = 0") {
    val a = (1L to 3000L).toDF("k")
    val skA = SketchOps.kmvSketch(a, "k", 128).localCheckpoint()
    val same = SketchOps.kmvSetEstimates(skA, skA, 128).head()
    assert(same.getLong(same.fieldIndex("jaccard_ppm")) === 1000000L)
    assert(same.getLong(same.fieldIndex("est_intersect_micro")) ===
      same.getLong(same.fieldIndex("est_union_micro")))
    val b = (10001L to 13000L).toDF("k")
    val disj = SketchOps.kmvSetEstimates(skA,
      SketchOps.kmvSketch(b, "k", 128), 128).head()
    assert(disj.getLong(disj.fieldIndex("k_intersect")) === 0L)
  }

  // ---------------- gram sums / solve refactor ----------------

  test("cramerRidgeSolve3 over grouped gramSums3 equals the " +
       "per-group ridgeCramer3 fits (the q309 streaming shape is " +
       "exactly the batch fit per group)") {
    val df = (1 to 300).map { i =>
      (s"g${i % 2}", (i % 7 + 1).toLong, (i % 5 + 2).toLong,
        (i % 3 + 1).toLong, (i % 40 + 5).toLong)
    }.toDF("g", "x1", "x2", "x3", "y")
    val grouped = AggOps.cramerRidgeSolve3(
        AggOps.gramSums3(df, "x1", "x2", "x3", "y", Seq(col("g"))),
        lambda = 500L, keep = Seq("g"))
      .orderBy("g").collect().toSeq
    val solo = Seq("g0", "g1").map { g =>
      val r = AggOps.ridgeCramer3(df.where(col("g") === g),
        "x1", "x2", "x3", "y", 500L).head()
      (g, r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    }
    assert(grouped.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))) === solo)
  }

  // ---------------- changepoint ----------------

  test("changepoint1: hand-computed level shift — split lands at " +
       "the boundary with the exact between-segment gain") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val df = Seq(0L, 0L, 0L, 10L, 10L).zipWithIndex
      .map { case (y, i) => ("g", ts(i), i.toLong, y) }
      .toDF("g", "ts", "tie", "y")
    val r = AggOps.changepoint1(df, "g", "ts", "tie", "y").head()
    // gains: i=1:20, i=2:53, i=3:120, i=4:45 => split at i=3
    assert(r.getLong(r.fieldIndex("split_i")) === 3L)
    assert(r.getLong(r.fieldIndex("gain_units")) === 120L)
    assert(r.getLong(r.fieldIndex("left_sum")) === 0L)
    assert(r.getLong(r.fieldIndex("right_sum")) === 20L)
    assert(r.getString(r.fieldIndex("split_ts")) ===
      "2024-01-01 00:02:00")
  }

  test("changepoint1: an all-ties flat series picks the SMALLEST " +
       "split index; a 1-row group drops; partition-invariant") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val flat = (0 until 4).map(i => ("f", ts(i), i.toLong, 5L))
    val lone = Seq(("l", ts(0), 0L, 7L))
    val df = (flat ++ lone).toDF("g", "ts", "tie", "y")
    val out = AggOps.changepoint1(df, "g", "ts", "tie", "y")
      .orderBy("g").collect()
    assert(out.length === 1 && out.head.getString(0) === "f")
    assert(out.head.getLong(out.head.fieldIndex("split_i")) === 1L)
    assert(out.head.getLong(out.head.fieldIndex("gain_units")) === 0L)
    val out7 = AggOps.changepoint1(df.repartition(7), "g", "ts",
      "tie", "y").orderBy("g").collect()
    assert(out7.toSeq === out.toSeq)
  }
}
