package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CleanOps, SplitOps}

/** Cleaning + split/sampling operators (SURVEY §2.2, §2.4, §2.8):
  * NaN/∞ profiling, median impute, stratified sampling fractions,
  * split disjointness/completeness, row-id properties. */
class CleanSplitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("nanCounts / nullOrNanCounts count exactly the pathological rows") {
    val df = Seq(1.0, Double.NaN, 2.0, Double.NaN).toDF("x")
      .withColumn("y", when(col("x") === 2.0, lit(null).cast("double"))
        .otherwise(lit(0.0)))
    val nan = CleanOps.nanCounts(df, Seq("x")).head.getLong(0)
    assert(nan === 2)
    val nn = CleanOps.nullOrNanCounts(df, Seq("y")).head.getLong(0)
    assert(nn === 1)
  }

  test("minMaxProfile emits min/max plus first(ignoreNulls) representatives") {
    val df = Seq((1.0, None: Option[String]), (5.0, Some("a")),
      (3.0, Some("b"))).toDF("v", "s")
    val row = CleanOps.minMaxProfile(df, Seq("v"), Seq("s")).head()
    assert(row.getDouble(row.fieldIndex("v_min")) === 1.0)
    assert(row.getDouble(row.fieldIndex("v_max")) === 5.0)
    // first over a 1-partition local frame is positional: skips the null
    assert(row.getString(row.fieldIndex("s_first")) === "a")
  }

  test("columnsByType splits string vs numeric, skips other types") {
    val df = Seq((1L, "a", 1.5, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "name", "score", "ts")
    val (strings, numerics) = CleanOps.columnsByType(df)
    assert(strings === Seq("name"))
    assert(numerics === Seq("id", "score"))
  }

  test("medianFill fills nulls with the interpolated median") {
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), None)
      .toDF("v")
    val filled = CleanOps.medianFill(df, Seq("v"))
    assert(filled.filter(col("v").isNull).count() === 0)
    // median of {1,2,3,4} = 2.5 (interpolated)
    assert(filled.agg(sum("v")).head.getDouble(0) === 1.0 + 2 + 3 + 4 + 2.5)
  }

  test("replaceInf masks both infinities, passes null and zero") {
    val df = Seq(Double.PositiveInfinity, Double.NegativeInfinity, 0.0, 7.0)
      .toDF("v")
    val out = CleanOps.replaceInf(df, Seq("v"), -1.0)
      .orderBy("v").as[Double].collect()
    assert(out === Array(-1.0, -1.0, 0.0, 7.0))
  }

  test("stratifiedSample draws ~fraction per stratum (seeded)") {
    val n = 2000
    val df = (0 until n).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "s")
    val sampled = SplitOps.stratifiedSample(df, "s",
      Map("a" -> 0.3, "b" -> 0.3), seed = 11L)
    val counts = sampled.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Bernoulli at p=0.3 over 1000 per stratum: 4σ ≈ 58
    assert(math.abs(counts("a") - 300L) < 80)
    assert(math.abs(counts("b") - 300L) < 80)
  }

  test("exactStratifiedSample returns exactly n per stratum, seeded") {
    val df = (0 until 900).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "s")
    val a = SplitOps.exactStratifiedSample(df, "s", 50, 7L)
    val counts = a.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("s0" -> 50L, "s1" -> 50L, "s2" -> 50L))
    // reproducible with the same seed
    val b = SplitOps.exactStratifiedSample(df, "s", 50, 7L)
    assert(a.select("id").as[Long].collect().sorted ===
      b.select("id").as[Long].collect().sorted)
    // undersized stratum returned whole
    val tiny = SplitOps.exactStratifiedSample(
      df.filter(col("id") < 10), "s", 50, 7L)
    assert(tiny.count() === 10)
  }

  test("antiJoinSplit: train ∪ valid = all, train ∩ valid = ∅") {
    val df = (0 until 500).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "s")
    val (train, valid) = SplitOps.antiJoinSplit(df, "id", "s", 0.4, 7L)
    assert(train.count() + valid.count() === 500)
    assert(train.select("id").intersect(valid.select("id")).count() === 0)
    assert(train.select("id").union(valid.select("id")).distinct()
      .count() === 500)
  }

  test("row-id assignment: rowNumberId contiguous, uniqueId unique, " +
       "contiguousId 0..N-1") {
    val df = (0 until 100).map(_.toLong).toDF("v").repartition(4)
    val rn = SplitOps.rowNumberId(df, col("v")).select("row_num")
      .as[Int].collect().sorted
    assert(rn === (1 to 100).toArray)
    val uid = SplitOps.uniqueId(df).select("row_num").as[Long].collect()
    assert(uid.distinct.length === 100)
    val cid = SplitOps.contiguousId(df).select("row_num")
      .as[Long].collect().sorted
    assert(cid === (0L until 100L).toArray)
  }

  test("medianFillApprox fills with a value near the exact median") {
    val df = (1 to 1001).map(i => if (i % 10 == 0) None else Some(i.toDouble))
      .toDF("v")
    val filled = CleanOps.medianFillApprox(df, Seq("v"), relativeError = 0.01)
    assert(filled.filter(col("v").isNull).count() === 0)
    // the sketch's fill value must be within 1% rank error of the median
    val exact = df.agg(median(col("v"))).head.getDouble(0)
    val fillVal = filled.exceptAll(df.na.drop()).head.getDouble(0)
    assert(math.abs(fillVal - exact) / exact < 0.05)
  }

  test("approx_count_distinct HLL stays within its rsd bound") {
    val df = (0 until 20000).map(i => i % 10000).toDF("v")
    val approx = df.agg(approx_count_distinct(col("v"), 0.05))
      .head.getLong(0)
    assert(math.abs(approx - 10000.0) / 10000.0 < 0.05, s"approx=$approx")
  }

  test("saltedJoin equals the plain join on skewed keys") {
    import graft.ops.RelOps
    // 90% of left rows share one hot key
    val left = (0 until 2000).map(i =>
      (if (i % 10 == 0) i.toLong else 7L, i.toLong)).toDF("k", "lv")
    val right = (0 until 50).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
      .select("k", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = RelOps.saltedJoin(left, right, "k", factor = 8)
      .select("k", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted === plain)
  }

  test("bloomPrunedJoin equals the plain join (false positives " +
       "eliminated by the join)") {
    import graft.ops.RelOps
    val probe = (0 until 5000).map(i => (i.toLong, i * 2L)).toDF("k", "pv")
    val build = (0 until 100).map(i => (i * 37L, s"b$i")).toDF("k", "bv")
    val plain = probe.join(build, Seq("k"))
      .select("k", "pv", "bv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val pruned = RelOps.bloomPrunedJoin(probe, build, "k", 1000L)
      .select("k", "pv", "bv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(pruned === plain)
  }

  test("histogram buckets partition the domain; counts sum to n") {
    import graft.ops.AggOps
    val df = (0 until 1000).map(i => i.toDouble).toDF("v")
    val h = AggOps.histogram(df, "v", 0.0, 100.0)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(h.length === 10)
    assert(h.map(_._2).sum === 1000L)
    h.foreach { case (b, _, lo, hi) =>
      assert(lo >= b * 100.0 && hi < (b + 1) * 100.0)
    }
  }

  test("bm25TopK ranks the doc with more query-term hits first and " +
       "ignores non-matching docs") {
    import graft.ops.SearchOps
    val docs = Seq(
      (1L, "spark spark spark engine"),
      (2L, "spark is one word here"),
      (3L, "nothing relevant at all")).toDF("doc_id", "text")
    val got = SearchOps.bm25TopK(docs, "doc_id", "text",
      Seq("spark"), 10).collect().map(_.getLong(0))
    assert(got === Array(1L, 2L))  // doc 3 has no postings → absent
  }

  test("bm25TopK: a rarer term outscores a common one at equal tf") {
    import graft.ops.SearchOps
    val docs = Seq(
      (1L, "rare word"), (2L, "common word"), (3L, "common word"),
      (4L, "common filler")).toDF("doc_id", "text")
    val scores = SearchOps.bm25TopK(docs, "doc_id", "text",
      Seq("rare", "common"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L))  // df(rare)=1 < df(common)=3
  }

  test("iqrOutlierFilter drops points outside the Tukey fences and " +
       "keeps the bulk") {
    import graft.ops.CleanOps
    val df = ((1 to 100).map(_.toDouble) ++ Seq(10000.0, -10000.0))
      .toDF("v")
    val kept = CleanOps.iqrOutlierFilter(df, "v")
      .as[Double].collect().sorted
    assert(kept === (1 to 100).map(_.toDouble).toArray)
  }

  test("groupCentroids is the per-dimension mean within each group") {
    import graft.ops.SimilarityOps
    val df = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 6.0f)),
      (1, Array(10.0f, 20.0f))).toDF("g", "vec")
    val got = SimilarityOps.groupCentroids(df, "g", "vec")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2)))
      .toMap
    assert(got === Map((0, 0) -> 2.0, (0, 1) -> 4.0,
      (1, 0) -> 10.0, (1, 1) -> 20.0))
  }

  test("seededSplit is reproducible with the same seed") {
    val df = (0 until 300).map(_.toLong).toDF("v")
    val a = SplitOps.seededSplit(df, Array(0.8, 0.2), 42L)
    val b = SplitOps.seededSplit(df, Array(0.8, 0.2), 42L)
    assert(a(0).as[Long].collect().sorted === b(0).as[Long].collect().sorted)
    assert(a(0).count() + a(1).count() === 300)
  }

  test("equiDepthBins: ties share a bin, NULLs are skipped, counts " +
       "cover exactly the non-null rows") {
    // 2 nulls + values 1,2,2,2,3,4 with bins=2: rank_below(2)=1 →
    // bin 0 for ALL THREE ties (never split across a boundary);
    // nulls must not inflate bin 0 or shift ranks
    val df = Seq[Option[Int]](Some(1), Some(2), Some(2), Some(2),
      Some(3), Some(4), None, None).toDF("v")
    val got = CleanOps.equiDepthBins(df, col("v"), bins = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got === Map(0L -> ((4L, 1, 2)), 1L -> ((2L, 3, 4))))
  }

  test("equiDepthBins: empty input yields zero bins; bins < 1 is " +
       "rejected up front") {
    val empty = spark.emptyDataFrame.withColumn("v", lit(1))
      .filter(lit(false))
    assert(CleanOps.equiDepthBins(empty, col("v"), 4).count() === 0)
    intercept[IllegalArgumentException] {
      CleanOps.equiDepthBins(Seq(1).toDF("v"), col("v"), 0)
    }
  }

  test("equiDepthBins: one window sort over the histogram — no " +
       "crossJoin/broadcast of a separate total aggregate") {
    val df = Seq(1, 2, 2, 3, 4, 5, 6, 7).toDF("v")
    val p = CleanOps.equiDepthBins(df, col("v"), 4)
      .queryExecution.executedPlan.toString
    assert("Window".r.findAllIn(p).length === 1,
      s"running count and total must share one Window operator:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"total must not arrive via a crossJoin:\n$p")
  }

  test("melt round-trips wide→long: every (id, metric) cell appears " +
       "once; plan is a single Expand with no exchange") {
    import graft.ops.RelOps
    val df = Seq((1L, 10.0, 0.5), (2L, 20.0, 0.25))
      .toDF("id", "price", "discount")
    val long = RelOps.melt(df, Seq("id"), Seq("price", "discount"))
    val got = long.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set((1L, "price", 10.0), (1L, "discount", 0.5),
      (2L, "price", 20.0), (2L, "discount", 0.25)))
    val p = long.queryExecution.executedPlan.toString
    assert(p.contains("Expand"), s"melt must plan as Expand:\n$p")
    assert(!p.contains("Exchange"),
      s"melt must not shuffle (scan-stage fan-out):\n$p")
  }

  test("melt with an empty valueCols list fails fast with Spark's " +
       "UNPIVOT contract error, not a silent empty frame") {
    import graft.ops.RelOps
    val df = Seq((1L, 1.0)).toDF("id", "x")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      RelOps.melt(df, Seq("id"), Seq.empty).collect()
    }
    assert(e.getMessage.toLowerCase.contains("unpivot"))
  }
}
