package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EvalOps

/** Evaluation operators: ranked-retrieval metrics, exact ROC-AUC via
  * the two-level prefix sum, and calibration bins + ECE. Every case is
  * hand-computed; AUC additionally cross-checks the O(P·N) pairwise
  * definition and partition invariance. */
class EvalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------- ranking metrics

  test("rankingMetrics: hand-computed NDCG/MRR/P@k/recall on k=3") {
    // q1: rel at ranks 1,3 of 3; 4 relevant in corpus
    // q2: nothing relevant retrieved; 2 relevant exist
    // q3: rel at rank 2 only; 1 relevant exists
    val ranked = Seq(
      (1L, 1, 1, 4L), (1L, 2, 0, 4L), (1L, 3, 1, 4L),
      (2L, 1, 0, 2L), (2L, 2, 0, 2L), (2L, 3, 0, 2L),
      (3L, 1, 0, 1L), (3L, 2, 1, 1L), (3L, 3, 0, 1L)
    ).toDF("q", "rn", "rel", "tr")
    val m = EvalOps.rankingMetrics(ranked, "q", "rn", "rel", "tr", k = 3)
      .orderBy("q").collect()
    val g = EvalOps.dcgGainsMicro(3) // 1000000, 630930, 500000
    assert(g.toSeq === Seq(1000000L, 630930L, 500000L))
    // q1: dcg = g1 + g3; idcg = min(4,3) gains = g1+g2+g3
    assert(m(0).getAs[Long]("dcg_micro") === g(0) + g(2))
    assert(m(0).getAs[Long]("idcg_micro") === g.sum)
    assert(m(0).getAs[Double]("ndcg") ===
      math.rint((g(0) + g(2)).toDouble / g.sum * 1e6) / 1e6)
    assert(m(0).getAs[Long]("mrr_micro") === 1000000L)
    assert(m(0).getAs[Double]("p_at_k") === 0.666667)
    assert(m(0).getAs[Double]("recall_at_k") === 0.5)
    // q2: no relevant retrieved — zero dcg, mrr 0, null ndcg? idcg>0
    assert(m(1).getAs[Long]("dcg_micro") === 0L)
    assert(m(1).getAs[Long]("mrr_micro") === 0L)
    assert(m(1).getAs[Double]("ndcg") === 0.0)
    // q3: first (only) relevant at rank 2 — mrr = 500000, ideal = g1
    assert(m(2).getAs[Long]("mrr_micro") === 500000L)
    assert(m(2).getAs[Long]("idcg_micro") === g(0))
    assert(m(2).getAs[Double]("ndcg") === 0.63093)
    assert(m(2).getAs[Double]("recall_at_k") === 1.0)
  }

  test("rankingMetrics: ranks beyond k are ignored, zero-relevant " +
       "query gets null recall and ndcg") {
    val ranked = Seq(
      (1L, 1, 0, 0L), (1L, 2, 1, 0L), // rel at rank 2 but k=1
      (1L, 5, 1, 0L)                  // beyond k entirely
    ).toDF("q", "rn", "rel", "tr")
    val m = EvalOps.rankingMetrics(ranked, "q", "rn", "rel", "tr", k = 1)
      .collect()(0)
    assert(m.getAs[Long]("n_rel_ret") === 0L)
    assert(m.isNullAt(m.fieldIndex("recall_at_k")))
    assert(m.getAs[Long]("idcg_micro") === 0L)
    assert(m.isNullAt(m.fieldIndex("ndcg")))
  }

  // ----------------------------------------------------------- AUC

  /** O(P·N) reference: mean over pairs of [pos > neg] + 0.5·[tie]. */
  private def naiveAuc(scores: Seq[(Long, Boolean)]): Double = {
    val pos = scores.filter(_._2).map(_._1)
    val neg = scores.filterNot(_._2).map(_._1)
    val s = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    s / (pos.size * neg.size)
  }

  test("rocAuc: hand case with ties matches the pairwise definition") {
    // pos: 30, 20, 10; neg: 20, 5 → pairs: (30>20)(30>5)(20=20:.5)
    // (20>5)(10<20:0)(10>5) = 4.5/6 = 0.75
    val rows = Seq((30L, true), (20L, true), (10L, true),
      (20L, false), (5L, false))
    val df = rows.toDF("s", "y")
    val r = EvalOps.rocAuc(df, "s", "y").collect()(0)
    assert(r.getAs[Long]("n_pos") === 3L)
    assert(r.getAs[Long]("n_neg") === 2L)
    assert(r.getAs[Double]("auc") === 0.75)
    assert(r.getAs[Double]("gini") === 0.5)
    assert(naiveAuc(rows) === 0.75)
  }

  test("rocAuc: perfect and inverted separators hit 1.0 and 0.0") {
    val perfect = Seq((5L, true), (4L, true), (3L, false), (2L, false))
    assert(EvalOps.rocAuc(perfect.toDF("s", "y"), "s", "y")
      .collect()(0).getAs[Double]("auc") === 1.0)
    val inverted = perfect.map { case (s, y) => (s, !y) }
    assert(EvalOps.rocAuc(inverted.toDF("s", "y"), "s", "y")
      .collect()(0).getAs[Double]("auc") === 0.0)
  }

  test("rocAuc: negative scores spanning bucket boundaries match the " +
       "naive AUC under varied partitioning and bucket width") {
    // deterministic spread crossing 0 and multiple 2^8 buckets
    val rows = (0 until 200).map { i =>
      val s = ((i * 2654435761L) % 2000L) - 1000L
      (s, (i % 3) == 0)
    }
    val expect = math.rint(naiveAuc(rows) * 1e6) / 1e6
    for (parts <- Seq(1, 7); shift <- Seq(8, 32)) {
      val df = rows.toDF("s", "y").repartition(parts)
      val r = EvalOps.rocAuc(df, "s", "y", bucketShift = shift)
        .collect()(0)
      assert(r.getAs[Double]("auc") === expect,
        s"parts=$parts shift=$shift")
    }
  }

  // --------------------------------------------------- calibration

  test("calibrationBins: hand-computed bins, confidence, accuracy, ECE") {
    // scores 0..100: lo=0, r=100; bins of width 10 (d*10 div 100)
    // bin 0: d∈[0,9]; bin 9: d∈[90,100) plus s=100 clamped
    val rows = Seq(
      (0L, false), (5L, false),    // bin 0: n=2 pos=0 sd=5
      (50L, true), (55L, false),   // bin 5: n=2 pos=1 sd=105
      (100L, true), (95L, true))   // bin 9: n=2 pos=2 sd=195
    val got = EvalOps.calibrationBins(rows.toDF("s", "y"), "s", "y",
        bins = 10).orderBy("bin").collect()
    assert(got.map(_.getAs[Long]("bin")).toSeq === Seq(0L, 5L, 9L))
    val b0 = got(0); val b5 = got(1); val b9 = got(2)
    assert(b0.getAs[Double]("confidence") === 0.025)   // 5/(2·100)
    assert(b0.getAs[Double]("accuracy") === 0.0)
    assert(b5.getAs[Double]("confidence") === 0.525)   // 105/200
    assert(b5.getAs[Double]("accuracy") === 0.5)
    assert(b9.getAs[Double]("confidence") === 0.975)   // 195/200
    assert(b9.getAs[Double]("accuracy") === 1.0)
    // ECE numerator: |5−0| + |105−100| + |195−200| = 15; /(100·6)
    assert(b0.getAs[Double]("ece") === 0.025)
    assert(got.map(_.getAs[Double]("ece")).distinct.length === 1)
  }

  test("calibrationBins: degenerate all-equal scores give bin 0 with " +
       "null confidence and ece") {
    val got = EvalOps.calibrationBins(
      Seq((7L, true), (7L, false)).toDF("s", "y"), "s", "y").collect()
    assert(got.length === 1)
    assert(got(0).getAs[Long]("bin") === 0L)
    assert(got(0).isNullAt(got(0).fieldIndex("confidence")))
    assert(got(0).isNullAt(got(0).fieldIndex("ece")))
    assert(got(0).getAs[Double]("accuracy") === 0.5)
  }
}
