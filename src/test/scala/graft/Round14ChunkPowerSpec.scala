package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EvalOps, TextOps}

/** Content-defined chunking + A/B power calculator (round 14,
  * batch E).
  */
class Round14ChunkPowerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ----- contentDefinedChunks -------------------------------------

  private val longText =
    (1 to 40).map(i => s"tok$i").mkString(" ")

  test("contentDefinedChunks: chunks partition the token stream — " +
       "counts sum to the doc total, ids are contiguous from 1") {
    val df = Seq((1L, longText), (2L, "a b c")).toDF("doc_id", "text")
    val rows = TextOps.contentDefinedChunks(df, "doc_id", "text",
      k = 3, mask = 4).orderBy("doc_id", "chunk_id").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc(1L).map(_.getLong(2)).sum === 40L)
    assert(byDoc(2L).map(_.getLong(2)).sum === 3L)
    byDoc.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).toSeq ===
        (1L to rs.length.toLong).toSeq)
    }
  }

  test("contentDefinedChunks: identical docs share every chunk " +
       "fingerprint (n_docs_sharing = 2)") {
    val df = Seq((1L, longText), (2L, longText)).toDF("doc_id", "text")
    val rows = TextOps.contentDefinedChunks(df, "doc_id", "text",
      k = 3, mask = 4).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(4) === 2L))
  }

  test("contentDefinedChunks: boundaries move WITH content — a " +
       "prefix insertion leaves the shared suffix's chunks intact") {
    // doc 2 = doc 1 with 3 alien tokens prepended. With mask 4 the
    // expected chunk length is ~4 tokens, so the 40-token shared
    // suffix re-synchronizes after at most one chunk; the suffix
    // chunks then hash identically (n_docs_sharing = 2 for them).
    // Fixed-width chunking (q64) would shift every chunk instead.
    val df = Seq((1L, longText), (2L, s"zz yy xx $longText"))
      .toDF("doc_id", "text")
    val rows = TextOps.contentDefinedChunks(df, "doc_id", "text",
      k = 3, mask = 4).collect()
    val shared = rows.filter(_.getLong(4) === 2L)
    assert(shared.nonEmpty, "no re-synchronized chunk survived — " +
      "the boundary rule is not content-defined")
    // and the shared chunks carry a meaningful share of doc 1
    val doc1Shared = shared.filter(_.getLong(0) === 1L)
      .map(_.getLong(2)).sum
    assert(doc1Shared >= 20L,
      s"only $doc1Shared of 40 suffix tokens re-synchronized")
  }

  test("contentDefinedChunks is partition-invariant") {
    val df = Seq((1L, longText), (2L, "a b c d e f g h"),
      (3L, longText)).toDF("doc_id", "text")
    def run(d: DataFrame) =
      TextOps.contentDefinedChunks(d, "doc_id", "text", 3, 4)
        .orderBy("doc_id", "chunk_id").collect().toSeq
    assert(run(df.repartition(7)) === run(df.coalesce(1)))
  }

  // ----- abPowerTwoProportion -------------------------------------

  test("abPowerTwoProportion: textbook 10% baseline, +50% relative " +
       "lift at alpha 5% / power 80%") {
    val df = (1 to 1000).map(i => i <= 100).toDF("conv")
    val r = EvalOps.abPowerTwoProportion(df, "conv", 0.5,
      1.959964, 0.841621).collect()(0)
    assert(r.getLong(0) === 1000L && r.getLong(1) === 100L)
    assert(r.getLong(2) === 100000L) // p_hat_ppm
    // replicate the op's double spelling
    val p1 = 100.0 / 1000.0; val p2 = p1 * 1.5
    val pbar = (p1 + p2) / 2.0
    val num = 1.959964 * math.sqrt(2.0 * pbar * (1.0 - pbar)) +
      0.841621 * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
    assert(r.getLong(3) === math.round(p2 * 1e6))
    assert(r.getLong(4) ===
      math.ceil(num * num / ((p2 - p1) * (p2 - p1))).toLong)
    // ballpark: the classic table value is ~685/arm for these params
    assert(r.getLong(4) > 600L && r.getLong(4) < 800L)
  }

  test("abPowerTwoProportion: halving the MDE roughly quadruples " +
       "the sample size (monotone in effect size)") {
    val df = (1 to 1000).map(i => i <= 100).toDF("conv")
    def n(mde: Double) =
      EvalOps.abPowerTwoProportion(df, "conv", mde,
        1.959964, 0.841621).collect()(0).getLong(4)
    assert(n(0.1) > 3 * n(0.2))
    assert(n(0.2) > n(0.4))
  }

  test("abPowerTwoProportion: degenerate data (no conversions) → " +
       "null sizing, counts intact") {
    val df = Seq(false, false, false).toDF("conv")
    val r = EvalOps.abPowerTwoProportion(df, "conv", 0.1,
      1.959964, 0.841621).collect()(0)
    assert(r.getLong(0) === 3L && r.getLong(1) === 0L)
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("abPowerTwoProportion is partition-invariant") {
    val df = (1 to 200).map(i => i % 7 == 0).toDF("conv")
    def run(d: DataFrame) =
      EvalOps.abPowerTwoProportion(d, "conv", 0.25,
        1.959964, 0.841621).collect().toSeq
    assert(run(df.repartition(9)) === run(df.coalesce(1)))
  }
}
