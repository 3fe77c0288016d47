package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EvalOps

/** Batch-E operators of round 13: grouped permutation tests with
  * Benjamini–Hochberg FDR control, and the tie-corrected Wilcoxon
  * rank-sum. */
class Round13BatchESpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("pairedPermutationTestBy: each group's summary equals the " +
       "ungrouped test run on that group alone") {
    val pairs = (1 to 60).map(i =>
      (s"g${i % 3}", i.toLong, (i % 9 - 4).toLong))
      .toDF("g", "id", "d")
    val grouped = EvalOps.pairedPermutationTestBy(pairs, "g", "id",
        "d", b = 16)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val solo = (0 to 2).map { g =>
      val one = EvalOps.pairedPermutationTest(
        pairs.where(col("g") === s"g$g").drop("g"), "id", "d", b = 16)
      val rows = one.collect()
      val h = rows.head
      (s"g$g", h.getLong(h.fieldIndex("n_pairs")),
        h.getLong(h.fieldIndex("t_obs")),
        rows.count(_.getBoolean(2)).toLong,
        h.getLong(h.fieldIndex("p_micro")))
    }
    assert(grouped.toSeq === solo)
  }

  test("bhAdjust: the step-up rule rejects exactly ranks 1..k* for " +
       "the LARGEST k* passing p_(i) <= (i/m)*alpha — including a " +
       "non-monotone pass pattern (rank 2 fails, rank 3 passes => " +
       "1..3 all reject)") {
    // m=4, alpha=1/2; thresholds (i/m)*alpha in micro: 125k, 250k,
    // 375k, 500k. ps: 100k (pass), 300k (fail at rank 2), 370k
    // (pass at rank 3), 900k (fail) => k*=3
    val tests = Seq(("a", 100000L), ("b", 300000L), ("c", 370000L),
      ("d", 900000L)).toDF("g", "p_micro")
    val out = EvalOps.bhAdjust(tests, "g", "p_micro", 1, 2)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getBoolean(4)))
    assert(out.toSeq === Seq(("a", 1L, true), ("b", 2L, true),
      ("c", 3L, true), ("d", 4L, false)))
    // nothing passes => nothing rejected
    val none = EvalOps.bhAdjust(
      Seq(("x", 800000L), ("y", 900000L)).toDF("g", "p_micro"),
      "g", "p_micro", 1, 10).collect()
    assert(none.forall(!_.getBoolean(4)))
  }

  test("wilcoxonRankSum: hand-computed tied fixture — doubled " +
       "midranks, U, tie mass, and the tie-corrected z") {
    // A: 1, 2, 2; B: 2, 3  => levels: 1(t=1), 2(t=3), 3(t=1), n=5
    // midranks: 1 -> 1; 2 -> 3 (2,3,4); 3 -> 5
    // W_A = 1 + 3 + 3 = 7 => w2 = 14; U = W - nA(nA+1)/2 = 7-6 = 1
    // => u2 = 2; ties: 3^3-3 = 24
    // var = 3*2/12 * (6 - 24/20) = 0.5 * 4.8 = 2.4
    // z = (U - nA*nB/2)/sqrt(var) = (1-3)/1.549193 = -1.290994
    val df = Seq((1L, true), (2L, true), (2L, true), (2L, false),
      (3L, false)).toDF("v", "a")
    val r = EvalOps.wilcoxonRankSum(df, "v", "a").head()
    assert(r.getLong(r.fieldIndex("n_a")) === 3L)
    assert(r.getLong(r.fieldIndex("n_b")) === 2L)
    assert(r.getLong(r.fieldIndex("w2_a")) === 14L)
    assert(r.getLong(r.fieldIndex("u2_a")) === 2L)
    assert(r.getLong(r.fieldIndex("tie_cube_sum")) === 24L)
    assert(r.getLong(r.fieldIndex("z_micro")) === -1290994L)
  }

  test("wilcoxonRankSum: symmetric under side swap (z negates) and " +
       "partition-invariant") {
    val df = (1 to 200).map(i =>
      ((i % 17).toLong, i % 3 == 0)).toDF("v", "a")
    val z1 = EvalOps.wilcoxonRankSum(df.repartition(7), "v", "a")
      .head()
    val z2 = EvalOps.wilcoxonRankSum(df.repartition(1), "v", "a")
      .head()
    assert(z1.toSeq === z2.toSeq)
    val swapped = EvalOps.wilcoxonRankSum(
      df.select(col("v"), (!col("a")).as("a")), "v", "a").head()
    // U_A - nAnB/2 negates under swap; ties/n symmetric
    assert(math.abs(z1.getLong(z1.fieldIndex("z_micro")) +
      swapped.getLong(swapped.fieldIndex("z_micro"))) <= 1L)
  }
}
