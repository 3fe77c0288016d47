package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DedupOps

/** Prefix-filtering exact set-similarity join: completeness (no
  * false negatives — the property LSH can't give) and soundness
  * against a brute-force all-pairs reference. */
class SetSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naivePairs(docs: Seq[(Long, String)], tNum: Int,
                         tDen: Int): Set[(Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      union = (sa | sb).size.toLong
      if inter * tDen >= union * tNum
    } yield (ia, ib, inter, union)).toSet
  }

  test("setSimilarityJoin equals brute-force all-pairs Jaccard at " +
       "the threshold — complete AND sound") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d f"),      // J(1,2) = 4/6 = 0.667 ≥ 0.6
      (3L, "a b c d e"),      // identical to 1
      (4L, "x y z w"),        // disjoint
      (5L, "a b x y z w"),    // J(4,5) = 4/6 ≥ 0.6
      (6L, "a b c"),          // J(1,6) = 3/5 = 0.6 — boundary KEEPS
      (7L, "q r s t u v"))    // J < 0.6 with everything
    val got = DedupOps.setSimilarityJoin(docs.toDF("id", "text"),
        "id", "text", tNum = 3, tDen = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === naivePairs(docs, 3, 5))
    // the boundary pair must be present (>= not >)
    assert(got.exists(p => p._1 == 1L && p._2 == 6L))
  }

  test("setSimilarityJoin under varied partitioning and a stricter " +
       "threshold stays equal to the reference") {
    val docs = (1L to 30L).map { i =>
      val base = (0 until 8).map(j => s"t${(i + j * 3) % 17}")
      (i, base.mkString(" "))
    }
    val expect = naivePairs(docs, 4, 5)
    val got = DedupOps.setSimilarityJoin(
        docs.toDF("id", "text").repartition(7), "id", "text",
        tNum = 4, tDen = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === expect)
  }
}
