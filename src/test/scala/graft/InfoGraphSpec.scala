package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, GraphOps}

/** Mutual information and k-core decomposition — closed-form identity
  * cases and cascade-peeling graphs. */
class InfoGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------ mutual information

  test("mutualInformation: independence gives 0, identity gives " +
       "mi == hx == hy with normalized 1") {
    // independent: every (x, y) cell equally likely
    val indep = (for (x <- 0 to 1; y <- 0 to 1; _ <- 1 to 5)
      yield (x, y)).toDF("x", "y")
    val i = AggOps.mutualInformation(indep, "x", "y").collect()(0)
    assert(i.getAs[Double]("mi") === 0.0)
    // identity: y == x, two equally likely values → H = ln 2
    val ident = (for (x <- 0 to 1; _ <- 1 to 5) yield (x, x))
      .toDF("x", "y")
    val d = AggOps.mutualInformation(ident, "x", "y").collect()(0)
    // per-cell micro rounding: 2 · round(0.5 · ln2 · 1e6) micro-nats
    val ln2 = 2 * math.round(0.5 * math.log(2) * 1e6).toDouble / 1e6
    assert(d.getAs[Double]("hx") === ln2)
    assert(d.getAs[Double]("hy") === ln2)
    assert(d.getAs[Double]("mi") === ln2)
    assert(d.getAs[Double]("mi_normalized") === 1.0)
  }

  test("mutualInformation: hand-computed asymmetric 2x2 matches the " +
       "closed form; constant column gives mi 0 and null normalized") {
    // cells: (0,0)=4 (0,1)=2 (1,0)=1 (1,1)=3 → N=10
    val rows = Seq.fill(4)((0, 0)) ++ Seq.fill(2)((0, 1)) ++
      Seq.fill(1)((1, 0)) ++ Seq.fill(3)((1, 1))
    val got = AggOps.mutualInformation(rows.toDF("x", "y"), "x", "y")
      .collect()(0)
    def cell(c: Long, cx: Long, cy: Long): Long =
      math.round(c.toDouble / 10 *
        math.log(c.toDouble * 10 / (cx * cy)) * 1e6)
    val miMicro = cell(4, 6, 5) + cell(2, 6, 5) + cell(1, 4, 5) +
      cell(3, 4, 5)
    assert(got.getAs[Double]("mi") === math.rint(miMicro.toDouble) / 1e6)
    val const = Seq((1, 5), (1, 7), (1, 7)).toDF("x", "y")
    val c = AggOps.mutualInformation(const, "x", "y").collect()(0)
    assert(c.getAs[Double]("hx") === 0.0)
    assert(c.getAs[Double]("mi") === 0.0)
    assert(c.isNullAt(c.fieldIndex("mi_normalized")))
  }

  // --------------------------------------------------------- k-core

  test("kCore peels a pendant chain in cascade, keeping exactly the " +
       "triangle at k = 2") {
    // triangle 1-2-3 plus chain 3-4, 4-5, 5-6: each peel round
    // removes only the current chain tail → three cascade rounds
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L)).toDF("src", "dst")
    val got = GraphOps.kCore(edges, k = 2).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCore: k above the densest degree empties; result is " +
       "partition-invariant; direction and self-loops are ignored") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (7L, 7L))
      .toDF("src", "dst")
    assert(GraphOps.kCore(edges, k = 3).count() === 0L)
    val tri = GraphOps.kCore(edges.repartition(5), k = 2)
      .orderBy("node").collect().map(_.getLong(0)).toSeq
    assert(tri === Seq(1L, 2L, 3L))
  }
}
