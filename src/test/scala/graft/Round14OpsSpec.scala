package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EvalOps, SimilarityOps}
import graft.streaming.{Scd2Open, StreamOps}

/** Round-14 verdict/ADVICE items: the IVF-PQ composition
  * (`SimilarityOps.ivfPqTopK` — round-13 verdict task 2), the
  * gridDbscan packed-cell-id bound check, and `bhAdjust` working for
  * any p-value column name.
  */
class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Two well-separated 4-dim halves (the q292 pqFixture shape):
    * vectors 0-3 near (+.5, +.5, -.5, -.5), vectors 4-7 the mirror —
    * separable by the IVF coarse quantizer AND per-subspace. */
  private def fixture(): DataFrame =
    (0 until 8).map { i =>
      val a = if (i < 4) 0.5 else -0.5
      (i.toLong, Seq(a + i * 0.001, a - i * 0.001,
        -a + i * 0.001, -a - i * 0.001))
    }.toDF("vec_id", "embedding")

  private def fit(df: DataFrame) = (
    SimilarityOps.kMeansMicro(df, "vec_id", "embedding", 2, 2),
    SimilarityOps.pqCodebooks(df, "vec_id", "embedding",
      m = 2, subLen = 2, k = 2, iters = 2))

  test("ivfPqTopK with nprobe = nlist (every cell probed) equals " +
       "pqAdcTopK over the same codes — the prune is the ONLY delta") {
    val df = fixture()
    val (cents, books) = fit(df)
    val full = SimilarityOps.pqAdcTopK(df,
        SimilarityOps.pqEncode(df, "vec_id", "embedding", books, 2),
        "vec_id", "embedding", books, subLen = 2, topK = 7)
      .select("query_id", "neighbor_id", "adc_d2", "rn")
      .orderBy("query_id", "rn").collect().toSeq
    val pruned = SimilarityOps.ivfPqTopK(df, df, "vec_id", "embedding",
        cents, books, subLen = 2, nprobe = 2, topK = 7)
      .select("query_id", "neighbor_id", "adc_d2", "rn")
      .orderBy("query_id", "rn").collect().toSeq
    assert(pruned === full)
  }

  test("ivfPqTopK nprobe=1: every returned neighbor sits in the " +
       "query's single probed cell (the prune actually prunes)") {
    val df = fixture()
    val (cents, books) = fit(df)
    val cellOf = df.select(col("vec_id"),
        element_at(SimilarityOps.nearestCellsMicro(
          SimilarityOps.microVec(col("embedding")), cents, 1), 1)
          .as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SimilarityOps.ivfPqTopK(df, df, "vec_id", "embedding",
        cents, books, subLen = 2, nprobe = 1, topK = 7).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(cellOf(r.getLong(1)) === cellOf(r.getLong(0)),
        s"neighbor ${r.getLong(1)} outside query ${r.getLong(0)}'s cell")
    }
    // separated halves: with one probed cell each query sees only its
    // own half — 3 neighbors, never 7
    val perQuery = got.groupBy(_.getLong(0)).view.mapValues(_.length)
    perQuery.foreach { case (q, n) => assert(n === 3, s"query $q") }
  }

  test("ivfPqTopK is partition-invariant") {
    val df = fixture()
    val (cents, books) = fit(df)
    def run(d: DataFrame) =
      SimilarityOps.ivfPqTopK(d.filter(col("vec_id") < 2), d,
          "vec_id", "embedding", cents, books, 2, 2, 3)
        .orderBy("query_id", "rn").collect().toSeq
    assert(run(df.repartition(7)) === run(df.coalesce(1)))
  }

  test("ivfPqTopK plan: corpus side streams through broadcast joins " +
       "only — no sort-merge / shuffled join touches the code table") {
    val df = fixture()
    val (cents, books) = fit(df)
    val p = SimilarityOps.ivfPqTopK(df, df, "vec_id", "embedding",
        cents, books, 2, 1, 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side join must broadcast:\n$p")
  }

  test("gridDbscan fails loudly when the grid is too fine for the " +
       "packed cell id (|cy| >= 500000 — round-13 ADVICE)") {
    val df = Seq((1L, Seq(0.9, 0.9, 0.0, 0.0)),
      (2L, Seq(0.9001, 0.9001, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.gridDbscan(df, "embedding",
        cellMicro = 1L, minPts = 1L).collect()
    }
    assert(e.getMessage.contains("too fine"))
    // a sane grid over the same data still clusters
    val ok = SimilarityOps.gridDbscan(df, "embedding",
      cellMicro = 100000L, minPts = 1L).collect()
    assert(ok.nonEmpty)
  }

  test("SCD2 state-version fence: restoring a stale-version state " +
       "record fails loudly with the rebuild instruction (round-13 " +
       "verdict task 4)") {
    val stale = Scd2Open("x", 1L, 10L, 1L, 10L, 0L,
      sv = StreamOps.Scd2StateVersion - 1)
    val st = TestGroupState.create[Scd2Open](
      org.apache.spark.api.java.Optional.of(stale),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val e = intercept[IllegalStateException] {
      StreamOps.scd2Step(1L,
        Iterator((1L, "y", java.lang.Long.valueOf(2L), 20L, 0L)),
        st, None).toList
    }
    assert(e.getMessage.contains("STALE STREAMING STATE"))
    assert(e.getMessage.contains("rebuild"))
    // a CURRENT-version state restores and versions normally
    val fresh = TestGroupState.create[Scd2Open](
      org.apache.spark.api.java.Optional.of(
        stale.copy(sv = StreamOps.Scd2StateVersion)),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out = StreamOps.scd2Step(1L,
      Iterator((1L, "y", java.lang.Long.valueOf(2L), 20L, 0L)),
      fresh, None).toList
    assert(out.length === 1 && out.head.version === 1L)
    assert(fresh.get.sv === StreamOps.Scd2StateVersion)
    assert(fresh.get.version === 2L)
  }

  test("bhAdjust works for any p-value column name (round-13 " +
       "ADVICE: the rank window must order by the post-rename col)") {
    val tests = Seq(("a", 1000L), ("b", 8000L), ("c", 30000L),
      ("d", 900000L)).toDF("grp", "pval")
    val got = EvalOps.bhAdjust(tests, "grp", "pval", 1, 20)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[String]("grp")).toSeq ===
      Seq("a", "b", "c", "d"))
    // alpha=.05, m=4: thresholds (i/4)*.05e6 = 12500/25000/37500/50000
    // p=(1000, 8000, 30000, 900000) → ranks 1,2,3 pass cutoffs up to
    // rank 3 (30000 <= 37500) → reject 1..3
    assert(got.map(_.getAs[Boolean]("rejected")).toSeq ===
      Seq(true, true, true, false))
  }
}
