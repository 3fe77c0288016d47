package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line (driver contract).
  * Results are materialized through the `noop` sink so the full plan —
  * not a count-only shortcut — is what's timed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state warmup: run EVERY query once at the smallest scale
    // factor before timing. Generated whole-stage code is cached by
    // source text, so each query's (identical) codegen at the target SF
    // hits the cache — without this, wide-aggregate shapes pay their
    // one-time Janino compile inside the timed loop (q32: 20.5 s cold
    // vs 6 s warm for identical data work). A long-lived cluster pays
    // this once per session; steady-state is the comparable number.
    // prefer the sf0.001 sibling of the target dir; fall back to the
    // target itself (warmup on target data still warms the code paths,
    // just slower). Failures are counted and reported, not silently
    // swallowed — a fully-failed warmup means the timings below are
    // cold-codegen numbers mislabeled as steady-state.
    val sibling = new java.io.File(new java.io.File(sfDir).getParent,
      "sf0.001")
    val warmDir = if (sibling.isDirectory) sibling.getPath else sfDir
    // SPARK_GRAFT_ONLY=q32_lsh_pairs,q65_quality_gate → bench only those
    // (local profiling aid; driver runs without it = full suite).
    // Unknown names fail loudly — a misspelling would otherwise bench
    // zero queries and emit an empty-but-plausible results file.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) =>
        val unknown = names -- SparkEntry.queries.keySet
        require(unknown.isEmpty,
          s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: " +
            unknown.mkString(", "))
        SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    var warmFailures = 0
    selected.foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        warmFailures += 1
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
    }
    if (warmFailures > 0)
      System.err.println(s"[bench] $warmFailures warmup failures " +
        s"(dir=$warmDir) — timings may include cold codegen")
    // DISCARDED TARGET-SF PASS (round-13 verdict finding 3): the first
    // interleaved pass on a freshly-started JVM is wildly contended —
    // the driver's independent round-13 run showed q38 51.3 s / q36
    // 40.5 s in run 1 vs ~0.4–2 s in runs 2–3, landing several medians
    // on the polluted pair. One full untimed pass at the TARGET sf
    // (shuffle files, page cache, JIT at real data volume — things the
    // sf0.001 codegen warmup can't touch) before the timed loop makes
    // median-of-3 robust. SPARK_GRAFT_SKIP_TARGET_WARMUP=1 disables it
    // (local single-query profiling where the extra pass just costs
    // time).
    if (!sys.env.get("SPARK_GRAFT_SKIP_TARGET_WARMUP").contains("1")) {
      selected.foreach { case (name, fn) =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(
            s"[bench] target warmup $name failed: ${e.getMessage}")
        }
      }
    }
    // Noise protocol (round-3 verdict: single-run deltas on a shared box
    // are untrustworthy below ~3×): run the WHOLE suite `runs` times in
    // sequence — interleaved across queries, so a host-load spike taxes
    // one run of many queries instead of every run of one query — and
    // report per-query MEDIANS. Raw per-run values go to a side file
    // the driver's tail-parse can't truncate.
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(3)
    val names = selected.keys.toSeq
    val raw = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    // A run that throws records NO timing: an analysis error "completes"
    // in ~0.07 s, and round 7's artifacts carried 21 such fake entries
    // that read as blazing-fast queries. Failed queries surface as
    // "err" in the output JSON (with the exception in `errors`) instead.
    val failed = scala.collection.mutable.Map[String, String]()
    (1 to runs).foreach { r =>
      selected.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          raw(name) = raw(name) :+ (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(2).mkString(" | ")
          System.err.println(s"[bench] $name (run $r) failed: ${e.getMessage}")
        }
      }
    }
    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // a query is clean only if EVERY run succeeded: a 1-of-3-success
    // query's "median" is a single arbitrary run (quite possibly the
    // noisiest) and must never seed a gate, so any failure — total or
    // partial — reports "err" in both outputs. Surviving raw runs stay
    // visible in the side file (with ok_runs) for diagnosis.
    val ok = names.filter(n => raw(n).nonEmpty && !failed.contains(n))
    val medians = ok.map(n => n -> median(raw(n)))
    val qs = names.map { n =>
      if (raw(n).nonEmpty && !failed.contains(n))
        "\"" + n + "\":" + median(raw(n))
      else "\"" + n + "\":\"err\""
    }.mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    val errJson = failed.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    // CONTENTION MARKER (round-14 verdict finding 1): a polluted run —
    // host load taxing run 1 of a freshly-started suite — shows up as a
    // large max/min spread within a query's raw triple, and the median
    // then lands on a still-contended value. Emitting the per-query
    // min-of-runs and the max/min spread lets an independent rerun
    // self-identify as contended (spread ≫ 1 with min at-or-below the
    // gate ⇒ noise, not a regression) without hand-reading raw triples.
    // Read rule documented in BASELINE.md ("Reading BENCH_MEDIANS").
    val rawJson = names.map { n =>
      val med =
        if (raw(n).nonEmpty && !failed.contains(n)) median(raw(n)).toString
        else "\"err\""
      val mn = if (raw(n).nonEmpty) raw(n).min else 0.0
      val spread =
        if (raw(n).nonEmpty && mn > 0) (raw(n).max / mn).toString
        else "null"
      "\"" + n + "\":{\"median\":" + med +
        ",\"min\":" + mn +
        ",\"spread\":" + spread +
        ",\"ok_runs\":" + raw(n).size +
        ",\"runs\":[" + raw(n).mkString(",") + "]}"
    }.mkString("{", ",", "}")
    val sideFile = sys.env.getOrElse("SPARK_GRAFT_MEDIANS_FILE",
      "/root/repo/BENCH_MEDIANS.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(sideFile),
      s"""{"sf":"$sfDir","runs":$runs,"errors":$errJson,"queries":$rawJson}""" + "\n")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"errors":$errJson}""")
    spark.stop()
  }
}
