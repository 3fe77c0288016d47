package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, SimilarityOps}

/** Batch-D operators of round 13: k-fold ridge CV by Gram-sum
  * subtraction and grid DBSCAN. */
class Round13BatchDSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------- ridge CV ----------------

  test("ridgeCv3: each fold's leave-fold-out coefficients equal a " +
       "from-scratch ridgeCramer3 fit on the complement (the " +
       "Gram-subtraction identity), and held-out SSE matches a " +
       "brute-force scoring pass at the same micro-β precision") {
    val rows = (1 to 400).map { i =>
      val (x1, x2, x3) = ((i % 7 + 1).toLong, (i % 5 + 2).toLong,
        (i % 3 + 1).toLong)
      (i % 4, x1, x2, x3, 3 * x1 + 2 * x2 + x3 + (i % 11) - 5)
    }.toDF("fold", "x1", "x2", "x3", "y")
    val cv = AggOps.ridgeCv3(rows, "x1", "x2", "x3", "y", "fold", 200L)
      .orderBy("fold").collect()
    assert(cv.length === 4)
    cv.foreach { r =>
      val f = r.getInt(0)
      val direct = AggOps.ridgeCramer3(rows.where(col("fold") =!= f),
        "x1", "x2", "x3", "y", 200L).head()
      assert(r.getLong(r.fieldIndex("b1_micro")) === direct.getLong(1))
      assert(r.getLong(r.fieldIndex("b2_micro")) === direct.getLong(2))
      assert(r.getLong(r.fieldIndex("b3_micro")) === direct.getLong(3))
      assert(r.getLong(r.fieldIndex("n_train")) === direct.getLong(0))
      // brute-force held-out SSE at the published micro-β precision
      val (b1, b2, b3) = (r.getLong(r.fieldIndex("b1_micro")) / 1e6,
        r.getLong(r.fieldIndex("b2_micro")) / 1e6,
        r.getLong(r.fieldIndex("b3_micro")) / 1e6)
      val held = rows.where(col("fold") === f)
        .select("x1", "x2", "x3", "y").collect()
      val sse = held.map { h =>
        val e = h.getLong(3) -
          (b1 * h.getLong(0) + b2 * h.getLong(1) + b3 * h.getLong(2))
        e * e
      }.sum
      val got = r.getLong(r.fieldIndex("sse_units"))
      assert(math.abs(got - sse) <= 1,
        s"fold $f sse $got vs brute $sse")
      assert(r.getLong(r.fieldIndex("n_test")) === held.length)
    }
  }

  // ---------------- grid DBSCAN ----------------

  test("gridDbscan: hand-built plane — two dense blobs bridged by " +
       "an adjacent core cell form ONE cluster, an isolated dense " +
       "cell is its own cluster, a sparse cell next to a core cell " +
       "is border, a far sparse cell is noise") {
    def pt(cx: Int, cy: Int, copies: Int) =
      Seq.fill(copies)((cx * 0.1 + 0.05, cy * 0.1 + 0.05))
    // cells (0,0) and (1,0) dense and adjacent -> one component;
    // (5,5) dense alone -> second component; (2,0) sparse next to
    // core (1,0) -> border; (8,8) sparse alone -> noise
    val pts = pt(0, 0, 5) ++ pt(1, 0, 4) ++ pt(5, 5, 6) ++
      pt(2, 0, 1) ++ pt(8, 8, 2)
    val df = pts.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, Array(a.toFloat, b.toFloat, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val out = SimilarityOps.gridDbscan(df, "embedding", 100000L, 3L)
      .orderBy("cx", "cy").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2),
        r.getString(3), if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap
    assert(out((0L, 0L))._2 === "core")
    assert(out((1L, 0L))._2 === "core")
    assert(out((0L, 0L))._3 === out((1L, 0L))._3) // bridged
    assert(out((5L, 5L))._2 === "core")
    assert(out((5L, 5L))._3 !== out((0L, 0L))._3) // separate cluster
    assert(out((2L, 0L)) === ((1L, "border", out((1L, 0L))._3)))
    assert(out((8L, 8L))._2 === "noise" && out((8L, 8L))._3 === -1L)
  }

  test("gridDbscan: negative coordinates floor (not truncate) into " +
       "cells, and the clustering is partition-invariant") {
    // -0.05 must land in cell -1, not cell 0
    val pts = Seq.fill(4)((-0.05, -0.05)) ++ Seq.fill(4)((0.05, 0.05))
    val df = pts.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, Array(a.toFloat, b.toFloat))
    }.toDF("vec_id", "embedding")
    val out = SimilarityOps.gridDbscan(df.repartition(5), "embedding",
        100000L, 3L)
      .orderBy("cx", "cy").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((-1L, -1L), (0L, 0L)))
    // diagonal adjacency: both core, one component
    assert(out.forall(_.getString(3) == "core"))
    assert(out.map(_.getLong(4)).distinct.length === 1)
    val out1 = SimilarityOps.gridDbscan(df.repartition(1), "embedding",
      100000L, 3L).orderBy("cx", "cy").collect()
    assert(out1.toSeq === out.toSeq)
  }
}
