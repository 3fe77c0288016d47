package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RelOps

/** Round-7 operator units: composite-key MERGE / snapshot diff — the
  * multi-column business key (the CDC norm) through the same
  * one-full-outer-join shape the single-key forms pin. The oracled
  * q134/q135 carry the DuckDB hash checks; these pin the label and
  * null-handling corners on hand-built rows. */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("composite-key mergeUpsert: delete / insert / update / keep " +
       "resolve per (k1, k2) pair — never per single column") {
    val base = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 30.0))
      .toDF("k1", "k2", "v")
    val changes = Seq(("a", 1, 11.0), ("a", 3, 33.0), ("b", 1, -1.0))
      .toDF("k1", "k2", "v")
    val got = RelOps.mergeUpsert(base, changes, Seq("k1", "k2"),
        chg => chg.getField("v") < 0)
      .collect().map(r => ((r.getString(0), r.getInt(1)),
        (r.getDouble(2), r.getString(3)))).toMap
    // ("b",1) deleted; ("a",2) kept (same k1 as updated rows — a
    // single-column join would have clobbered it)
    assert(got === Map(
      ("a", 1) -> ((11.0, "updated")),
      ("a", 2) -> ((20.0, "kept")),
      ("a", 3) -> ((33.0, "inserted"))))
  }

  test("composite-key mergeUpsert: a NULL-bearing change row wins " +
       "WHOLESALE (whole-struct pick, no field mixing)") {
    val base = Seq(("a", 1, Some(10.0), Some("x"))).toDF("k1", "k2", "v", "s")
    val changes = Seq(("a", 1, None: Option[Double], Some("y")))
      .toDF("k1", "k2", "v", "s")
    val row = RelOps.mergeUpsert(base, changes, Seq("k1", "k2"),
      _ => lit(false)).collect().head
    assert(row.isNullAt(row.fieldIndex("v")),
      "the change's NULL v must win — field-level coalesce would " +
        "resurrect the base's 10.0")
    assert(row.getString(row.fieldIndex("s")) === "y")
  }

  test("composite-key mergeUpsert/snapshotDiff: empty sides degrade " +
       "gracefully (all-kept / all-inserted / all-added / all-removed)") {
    val rows = Seq(("a", 1, 1.0), ("b", 2, 2.0)).toDF("k1", "k2", "v")
    val none = rows.filter(lit(false))
    def actions(base: org.apache.spark.sql.DataFrame,
                chg: org.apache.spark.sql.DataFrame) =
      RelOps.mergeUpsert(base, chg, Seq("k1", "k2"), _ => lit(false))
        .select("action").as[String].collect().toSeq.sorted
    assert(actions(rows, none) === Seq("kept", "kept"))
    assert(actions(none, rows) === Seq("inserted", "inserted"))
    def statuses(o: org.apache.spark.sql.DataFrame,
                 n: org.apache.spark.sql.DataFrame) =
      RelOps.snapshotDiff(o, n, Seq("k1", "k2"))
        .select("status").as[String].collect().toSeq.sorted
    assert(statuses(rows, none) === Seq("removed", "removed"))
    assert(statuses(none, rows) === Seq("added", "added"))
    assert(RelOps.mergeUpsert(none, none, Seq("k1", "k2"),
      _ => lit(false)).count() === 0)
  }

  test("trailingDecayFeatures: strictly-earlier window, hand-computed " +
       "weights, zero-history events kept with zero features") {
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000L)
    val df = Seq(
      (1L, 10L, Some(ts(0)), 2.0),    // no prior
      (1L, 11L, Some(ts(60)), 4.0),   // prior: event 10 @ t=0
      (1L, 12L, Some(ts(4000)), 8.0), // window [400, 4000): priors out
      (2L, 20L, Some(ts(60)), 1.0),   // other key: never sees key 1
      (2L, 21L, None, 9.0)            // NULL ts: kept, zero features
    ).toDF("user_id", "event_id", "ts", "value")
    val got = RelOps.trailingDecayFeatures(df, "user_id", "ts",
        "event_id", "value", windowSeconds = 3600L, tauSeconds = 1800.0,
        bucketSeconds = 3600L)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val w = BigDecimal(math.exp(-60.0 / 1800.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wv = BigDecimal(2.0 * math.exp(-60.0 / 1800.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Map(
      10L -> ((0L, 0.0, 0.0)),  // kept despite zero history
      11L -> ((1L, w, wv)),
      12L -> ((0L, 0.0, 0.0)),  // candidates exist but fall outside
      20L -> ((0L, 0.0, 0.0)),
      21L -> ((0L, 0.0, 0.0)))) // NULL ts survives (explode_outer)
  }

  test("trailingDecayFeatures plans as an equi-join on (key, bucket) " +
       "— no nested-loop, windows crossing bucket boundaries exact") {
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000L)
    // prior at t=3590 (bucket 0), event at t=3610 (bucket 1): the
    // trailing hour spans both buckets — the explode must find it
    val df = Seq((1L, 1L, ts(3590), 5.0), (1L, 2L, ts(3610), 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = RelOps.trailingDecayFeatures(df, "user_id", "ts",
      "event_id", "value", 3600L, 1800.0, 3600L)
    val row = out.filter(col("event_id") === 2L).collect().head
    assert(row.getLong(row.fieldIndex("n_prior")) === 1L,
      "cross-bucket prior missed")
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"decay features must equi-join on (key, bucket):\n$p")
  }

  test("composite-key snapshotDiff: status per (k1, k2); NULL payload " +
       "fields compare null-safe (never misreport 'changed')") {
    val old_ = Seq(("a", 1, None: Option[Double]), ("a", 2, Some(2.0)),
      ("b", 1, Some(3.0))).toDF("k1", "k2", "v")
    val new_ = Seq(("a", 1, None: Option[Double]), ("a", 2, Some(9.0)),
      ("c", 1, Some(4.0))).toDF("k1", "k2", "v")
    val got = RelOps.snapshotDiff(old_, new_, Seq("k1", "k2"))
      .collect().map(r => ((r.getString(0), r.getInt(1)),
        r.getString(r.fieldIndex("status")))).toMap
    assert(got === Map(
      ("a", 1) -> "unchanged", // NULL <=> NULL
      ("a", 2) -> "changed",
      ("b", 1) -> "removed",
      ("c", 1) -> "added"))
  }
}
