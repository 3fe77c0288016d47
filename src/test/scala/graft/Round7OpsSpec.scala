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

  test("exactKPerGroupHash: exactly k rows per group, call-to-call " +
       "deterministic, k > group size degrades to the whole group, " +
       "k < 1 rejected") {
    val df = (1 to 500).map(i => (i.toLong, if (i % 3 == 0) "x" else "y"))
      .toDF("id", "g")
    val a = graft.ops.SplitOps.exactKPerGroupHash(df, "g", "id", 7)
    val sizes = a.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes === Map("x" -> 7L, "y" -> 7L))
    val b = graft.ops.SplitOps.exactKPerGroupHash(df, "g", "id", 7)
    assert(a.collect().map(_.getLong(0)).sorted
      sameElements b.collect().map(_.getLong(0)).sorted,
      "md5 rank must be deterministic across invocations")
    // a different salt draws a (near-certainly) different member set
    val c = graft.ops.SplitOps.exactKPerGroupHash(df, "g", "id", 7, "z")
    assert(!(a.collect().map(_.getLong(0)).sorted
      sameElements c.collect().map(_.getLong(0)).sorted))
    val tiny = df.filter(col("id") <= 10)
    assert(graft.ops.SplitOps.exactKPerGroupHash(tiny, "g", "id", 999)
      .count() === 10L)
    intercept[IllegalArgumentException] {
      graft.ops.SplitOps.exactKPerGroupHash(df, "g", "id", 0)
    }
  }

  test("runFileSinkPhase: restart from the same checkpoint RESUMES — " +
       "phase 1 emits only watermark-closed windows, phase 2 restores " +
       "the open-window state and completes to the exact batch totals") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Paths.get("target/spec_stream_restart")
    Fs.deleteRecursively(base)
    val src = base.resolve("src"); Files.createDirectories(src)
    val ckpt = base.resolve("ckpt").toString
    val out = base.resolve("out").toString
    // 8 hourly windows x 2 types, a row every 10 minutes
    val rows = for {
      h <- 0 until 8; m <- 0 until 60 by 10; t <- Seq("a", "b")
    } yield (t, 1.0 + h + m / 100.0,
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00"))
    val df = rows.toDF("event_type", "value", "ts")
    def stage(d: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = base.resolve(s"tmp_$name").toString
      d.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Fs.listDir(Paths.get(tmp))(
        _.filter(p => p.getFileName.toString.startsWith("part-"))
          .findFirst().get())
      Files.move(part, src.resolve(s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Fs.deleteRecursively(Paths.get(tmp))
    }
    def runPhase(): Unit = {
      val stream = graft.streaming.StreamOps.fileStream(spark,
        spark.read.parquet(src.toString).schema, src.toString)
      graft.streaming.StreamOps.runFileSinkPhase(
        graft.streaming.StreamOps.tumblingCounts(stream, "ts",
          "event_type", "1 hour", "1 hour"),
        ckpt, out, statePartitions = Some(4))
    }
    // phase 1 = hours 0-3: max ts 03:50 -> watermark 02:50 -> only the
    // hour-0 and hour-1 windows have closed (end <= watermark)
    stage(df.filter(hour(col("ts")) < 4), "p1")
    runPhase()
    val after1 = spark.read.parquet(out).count()
    assert(after1 === 4L,
      s"phase 1 must emit exactly the watermark-closed windows, got $after1")
    // phase 2 = hours 4-7 plus a far-future sentinel; hours 2-3 held in
    // restored state from phase 1 must surface with their ORIGINAL rows
    val sentinel = Seq(("s", 0.0,
      java.sql.Timestamp.valueOf("2024-01-03 00:00:00")))
      .toDF("event_type", "value", "ts")
    stage(df.filter(hour(col("ts")) >= 4).unionByName(sentinel), "p2")
    runPhase()
    val got = spark.read.parquet(out)
      .filter(col("event_type") =!= "s")
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("total_value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        ((r.getLong(2), math.round(r.getDouble(3) * 100) / 100.0)))
      .toMap
    val want = df.groupBy(date_trunc("hour", col("ts")).as("ws"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("tv"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        ((r.getLong(2), math.round(r.getDouble(3) * 100) / 100.0)))
      .toMap
    assert(got === want,
      "restart must reproduce the batch aggregate exactly once")
  }

  test("histPercentiles: percentile_cont interpolation from the " +
       "distinct-value histogram — hand-computed ranks, tie-heavy " +
       "values, NULLs skipped, out-of-range ps rejected") {
    import graft.ops.CleanOps
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 4.0), ("g", 8.0))
      .toDF("k", "v")
    val got = CleanOps.histPercentiles(df, "k", "v",
        Seq(0.25, 0.5, 0.95)).collect().head
    // r = p·(n−1): 0.75 → 1.75; 1.5 → 3.0; 2.85 → 4 + 0.85·4 = 7.4
    assert(math.abs(got.getDouble(1) - 1.75) < 1e-9)
    assert(math.abs(got.getDouble(2) - 3.0) < 1e-9)
    assert(math.abs(got.getDouble(3) - 7.4) < 1e-9)
    // ties: median of [1,1,1,2] sits inside the value-1 run
    val ties = Seq(("g", 1.0), ("g", 1.0), ("g", 1.0), ("g", 2.0))
      .toDF("k", "v")
    assert(CleanOps.histPercentiles(ties, "k", "v", Seq(0.5))
      .collect().head.getDouble(1) === 1.0)
    // NULLs must not shift ranks (the equiDepthBins contract)
    val withNull = Seq(("g", Some(1.0)), ("g", None), ("g", Some(3.0)))
      .toDF("k", "v")
    assert(CleanOps.histPercentiles(withNull, "k", "v", Seq(0.5))
      .collect().head.getDouble(1) === 2.0)
    intercept[IllegalArgumentException] {
      CleanOps.histPercentiles(df, "k", "v", Seq(1.5))
    }
  }

  test("winsorize: values clamp to the per-group [pLo, pHi] fences, " +
       "NULL values stay NULL, inverted band rejected") {
    import graft.ops.CleanOps
    val df = ((1 to 10).map(i => ("g", Some(i.toDouble))) :+
      (("g", None: Option[Double]))).toDF("k", "v")
    val got = CleanOps.winsorize(df, "k", "v", 0.1, 0.9)
      .select(col("v"), col("winsorized")).collect()
    // fences: r=0.9 → 1.9, r=8.1 → 9.1
    val byV = got.filter(!_.isNullAt(0))
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(byV(1.0) - 1.9) < 1e-9, "low tail must clamp up")
    assert(math.abs(byV(10.0) - 9.1) < 1e-9, "high tail must clamp down")
    assert(byV(5.0) === 5.0, "in-band values pass through")
    assert(got.filter(_.isNullAt(0)).forall(_.isNullAt(1)),
      "NULL values must not be clamped to a fence")
    intercept[IllegalArgumentException] {
      CleanOps.winsorize(df, "k", "v", 0.9, 0.1)
    }
  }

  test("madOutlierReport: hand-computed median/MAD; MAD = 0 means any " +
       "deviation is an outlier and zero deviation is not (no x/0)") {
    import graft.ops.CleanOps
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 100.0))
      .toDF("k", "v")
    val got = CleanOps.madOutlierReport(df, "k", "v").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    // a: med 3, adevs [2,1,0,1,97] → mad 1; only 97 > 5.1891
    assert(got("a") === ((5L, 3.0, 1.0, 1L)))
    // b: med 5, adevs [0,0,0,95] → mad 0; 95 > 0 outlier, zeros not
    assert(got("b") === ((4L, 5.0, 0.0, 1L)))
  }

  test("keySkewReport: uniform keys score skew_factor 1 and entropy " +
       "ln(n_keys); a hot key drives top_share and skew_factor") {
    import graft.ops.AggOps
    val uniform = (for (k <- Seq("a", "b", "c", "d"); _ <- 1 to 5)
      yield ("u", k)).toDF("g", "key")
    val hot = (("h", "hot") +: (for (_ <- 1 to 15) yield ("h", "hot")) ++:
      Seq(("h", "s1"), ("h", "s2"), ("h", "s3"), ("h", "s4")))
      .toDF("g", "key")
    val got = AggOps.keySkewReport(uniform.unionByName(hot), "g", "key")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val (uk, un, us, ue, uf) = got("u")
    assert((uk, un, us, uf) === ((4L, 20L, 0.25, 1.0)))
    assert(math.abs(ue - math.log(4.0)) < 1e-9)
    val (hk, hn, hs, _, hf) = got("h")
    assert((hk, hn, hs, hf) === ((5L, 20L, 0.8, 4.0)))
  }

  test("paretoCoverage: exact minimum key count via count-of-counts " +
       "interpolation — hot-key, uniform, and on-boundary groups") {
    import graft.ops.AggOps
    // h: hot key with 16 rows + 4 singles → 0.8·20 = 16 → 1 key
    // u: 4 uniform keys of 5 → 16 needs ceil(16/5) = 4 keys
    // b: counts [3,3,2,2] → 0.8·10 = 8 lands ON a level boundary:
    //    2 threes (6) + 1 two = exactly 8 → 3 keys
    val rows =
      (1 to 16).map(_ => ("h", "hot")) ++
        Seq(("h", "s1"), ("h", "s2"), ("h", "s3"), ("h", "s4")) ++
        (for (k <- Seq("a", "b", "c", "d"); _ <- 1 to 5)
          yield ("u", k)) ++
        Seq.fill(3)(("b", "x")) ++ Seq.fill(3)(("b", "y")) ++
        Seq.fill(2)(("b", "z")) ++ Seq.fill(2)(("b", "w"))
    val got = AggOps.paretoCoverage(rows.toDF("g", "key"), "g", "key")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("h") === ((5L, 20L, 1L)))
    assert(got("u") === ((4L, 20L, 4L)))
    assert(got("b") === ((4L, 10L, 3L)))
    intercept[IllegalArgumentException] {
      AggOps.paretoCoverage(rows.toDF("g", "key"), "g", "key", 0.0)
    }
  }

  test("update-mode live table: a window spanning micro-batches is " +
       "RE-EMITTED and replaced in the keyed sink — the final table " +
       "converges to the batch totals, not an append trail") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import graft.streaming.StreamOps
    val base = Paths.get("target/spec_live_table")
    Fs.deleteRecursively(base)
    val src = base.resolve("src"); Files.createDirectories(src)
    val out = base.resolve("out").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def stage(d: org.apache.spark.sql.DataFrame, name: String,
              mtime: Long): Unit = {
      val tmp = base.resolve(s"tmp_$name").toString
      d.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Fs.listDir(Paths.get(tmp))(
        _.filter(p => p.getFileName.toString.startsWith("part-"))
          .findFirst().get())
      val dest = src.resolve(s"$name.parquet")
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
      Fs.deleteRecursively(Paths.get(tmp))
    }
    // window W = 10:00; batch 1 carries two W rows, batch 2 a third
    // (later ts, same window — NOT late) plus an 11:00 row
    stage(Seq(("a", 1.0, ts("2024-01-01 10:05:00")),
      ("a", 2.0, ts("2024-01-01 10:10:00"))).toDF("k", "v", "ts"),
      "b1", 1000000000000L)
    stage(Seq(("a", 4.0, ts("2024-01-01 10:20:00")),
      ("a", 8.0, ts("2024-01-01 11:00:00"))).toDF("k", "v", "ts"),
      "b2", 1000000600000L)
    val agg = StreamOps.fileStream(spark,
        spark.read.parquet(src.toString).schema, src.toString,
        maxFilesPerTrigger = Some(1))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("tv"))
      .select(date_format(col("window.start"), "HH:mm").as("w"),
        col("k"), col("n"), col("tv"),
        concat_ws("|", date_format(col("window.start"), "HH:mm"),
          col("k")).as("_k"))
    val seen = scala.collection.mutable.ArrayBuffer[Set[String]]()
    val inner = StreamOps.keyedParquetUpsert(spark, out, "_k")
    StreamOps.sinkStream(agg, (b, id) => {
      val keys = b.select(col("_k")).collect().map(_.getString(0)).toSet
      if (keys.nonEmpty) seen.synchronized { seen += keys }
      inner(b, id)
    }, outputMode = "update").awaitTermination()
    assert(seen.size === 2, s"expected two emitting batches, got $seen")
    assert(seen.forall(_.contains("10:00|a")),
      s"the spanning window must re-emit in both batches: $seen")
    val fin = spark.read.parquet(out)
      .select(col("w"), col("n"), col("tv")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(fin === Map("10:00" -> ((3L, 7.0)), "11:00" -> ((1L, 8.0))),
      "replaced totals must equal the batch aggregate")
  }

  test("histPercentiles composite key: each (k1, k2) pair gets its own " +
       "independent percentiles — a single-column group would mix them") {
    import graft.ops.CleanOps
    val df = Seq(
      ("a", "x", 1.0), ("a", "x", 3.0),   // median 2.0
      ("a", "y", 10.0), ("a", "y", 30.0), // median 20.0 (same k1!)
      ("b", "x", 100.0))                  // median 100.0
      .toDF("k1", "k2", "v")
    val got = CleanOps.histPercentiles(df, Seq("k1", "k2"), "v", Seq(0.5))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got === Map(("a", "x") -> 2.0, ("a", "y") -> 20.0,
      ("b", "x") -> 100.0))
  }

  test("shortestPaths: hand-computed BFS distances — source at 0, " +
       "min-hop through a cycle, maxHops bound drops the far node, " +
       "disconnected node omitted") {
    import graft.ops.GraphOps
    // 1→2→3→4→5 chain, plus shortcut 1→3 and back-edge 3→1 (cycle);
    // node 9 is disconnected. From 1 with maxHops=2: 1:0, 2:1, 3:1
    // (shortcut beats the 2-hop chain), 4:2; 5 needs 3 hops → dropped.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L),
      (3L, 1L), (9L, 9L)).toDF("src", "dst")
    val source = Seq(Tuple1(1L)).toDF("id")
    val got = GraphOps.shortestPaths(edges, source, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
    // maxHops = 0 → just the seed
    val seedOnly = GraphOps.shortestPaths(edges, source, maxHops = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(seedOnly === Map(1L -> 0))
  }

  test("shortestPaths at maxHops=10: checkpoint cadence keeps the " +
       "returned plan bounded, results match the cadence-free run, " +
       "and the edge cache is unpersisted") {
    import graft.ops.GraphOps
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (8L, 9L), (9L, 10L), (10L, 11L))
      .toDF("src", "dst")
    val source = Seq(Tuple1(1L)).toDF("id")
    val r = GraphOps.shortestPaths(edges, source, maxHops = 10,
      checkpointEvery = 3)
    val nPlanNodes =
      r.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(nPlanNodes <= 3,
      s"expected a checkpointed leaf plan, got $nPlanNodes operators")
    val noCp = GraphOps.shortestPaths(edges, source, maxHops = 10,
        checkpointEvery = 99)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val gotMap = r.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotMap === noCp)
    assert(gotMap === (1L to 11L).map(i => i -> (i - 1).toInt).toMap)
    // cache hygiene: the distinct edge plan must not linger
    val e = edges.select(col("src"), col("dst")).distinct()
    assert(spark.sharedState.cacheManager.lookupCachedData(
        e.asInstanceOf[org.apache.spark.sql.classic.Dataset[
          org.apache.spark.sql.Row]]).isEmpty,
      "shortestPaths left its edge table cached")
  }
}
