package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EvalOps, FitArtifacts}

/** Round-17 units for the ORACLED fit → persist → stream-score loop
  * (round-16 verdict task 1) and the shared-β refactor (task 2): the
  * β artifact round-trips bit for bit, artifact-scored confusion is
  * bit-identical to the in-plan fit, staleness fails loudly, and the
  * streaming scorer is restart-safe (exactly-once across a
  * checkpointed two-phase replay). The oracled q393 carries the
  * DuckDB hash check; these pin the corners no oracle can see. */
class Round17OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** A small 3-class fixture with real signal: x1 thresholds decide
    * the label (plus a little noise-free overlap via x2). */
  private def fixture() = {
    val rows = (1 to 600).map { i =>
      val x1 = i % 50
      val lab = if (x1 < 15) 0L else if (x1 < 35) 1L else 2L
      (i.toLong, x1.toLong, (i % 11).toLong, lab)
    }
    rows.toDF("id", "x1", "x2", "lab")
  }

  test("logisticOvrBetas + ovrScoreConfusion replay logisticOvr " +
       "bit for bit — the fit/score split changes nothing") {
    val df = fixture()
    val labels = Seq(0L, 1L, 2L)
    val fused = EvalOps.logisticOvr(df, "x1", "x2", "lab", labels, 3)
      .orderBy("label", "pred").collect().map(_.toSeq)
    val betas = EvalOps.logisticOvrBetas(df, "x1", "x2", "lab",
        labels, 3)
      .orderBy("label").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val split = EvalOps.ovrScoreConfusion(df, "x1", "x2", "lab",
        labels, betas)
      .orderBy("label", "pred").collect().map(_.toSeq)
    assert(fused.toSeq === split.toSeq,
      "artifact-scored confusion must equal the in-plan fit exactly")
    // and the fixture carries signal — the fit must beat the floor
    val acc = split.head(5).asInstanceOf[Long]
    assert(acc > 600000L,
      s"3-class signal fixture should score >60%, got ${acc} ppm")
  }

  test("saveGlmBetas/loadGlmBetas: bit-exact round trip, provenance " +
       "staleness and label-domain mismatch fail LOUDLY") {
    val path = "target/spec_fit_artifacts/ovr_beta_spec"
    val betas = Seq((0L, 123L, -456L, 789L), (1L, 1L, 2L, 3L),
      (2L, -9L, 0L, 7L))
    val prov = Map("rows" -> "600", "iters" -> "3")
    FitArtifacts.saveGlmBetas(spark, path, betas, prov)
    val loaded = FitArtifacts.loadGlmBetas(spark, path,
      Seq(0L, 1L, 2L), prov)
    assert(loaded === betas.map(b => (b._1, (b._2, b._3, b._4))))
    // stale provenance → loud failure
    intercept[IllegalArgumentException] {
      FitArtifacts.loadGlmBetas(spark, path, Seq(0L, 1L, 2L),
        Map("rows" -> "601"))
    }
    // wrong label domain → loud failure
    intercept[IllegalArgumentException] {
      FitArtifacts.loadGlmBetas(spark, path, Seq(0L, 1L, 2L, 3L))
    }
    // empty / duplicate label save rejected
    intercept[IllegalArgumentException] {
      FitArtifacts.saveGlmBetas(spark, path + "_bad", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      FitArtifacts.saveGlmBetas(spark, path + "_bad",
        Seq((0L, 1L, 2L, 3L), (0L, 4L, 5L, 6L)))
    }
  }

  test("ovrPredExpr ties go to the EARLIEST label and rows outside " +
       "the label domain still score") {
    val df = Seq((0L, 0L), (100L, 0L)).toDF("x1", "x2")
    // identical β per class ⇒ all margins tie ⇒ earliest label wins
    val tied = df.select(EvalOps.ovrPredExpr(col("x1"), col("x2"),
      Seq(5L, 7L, 9L), Seq((1L, 1L, 0L), (1L, 1L, 0L), (1L, 1L, 0L)))
      .as("p")).collect().map(_.getLong(0)).toSeq
    assert(tied === Seq(5L, 5L))
    intercept[IllegalArgumentException] {
      EvalOps.ovrPredExpr(col("x1"), col("x2"), Seq(0L, 1L),
        Seq((0L, 0L, 0L)))
    }
  }

  test("multiclassSummary: hand-computed binary table (macro/micro " +
       "F1, kappa, MCC) and the degenerate single-class NULLs") {
    // TP=40 (1,1), TN=45 (0,0), FP=5 (0->1), FN=10 (1->0), n=100
    val conf = Seq((0L, 0L, 45L), (0L, 1L, 5L), (1L, 0L, 10L),
      (1L, 1L, 40L)).toDF("label", "pred", "cnt")
    val r = EvalOps.multiclassSummary(conf, "label", "pred", "cnt")
      .collect().head
    assert(r.getLong(0) === 100L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 850000L) // micro F1 = accuracy
    // class 0: 2*45e6 div 105 = 857142; class 1: 80e6 div 95 =
    // 842105; macro = floor(mean) = 849623
    assert(r.getLong(3) === 849623L)
    // kappa = (100*85 - 5000)/(10000 - 5000) = 0.7
    assert(r.getLong(4) === 700000L)
    // Gorodkin R_K = 3500/(sqrt(4950)*sqrt(5000)) — same spelling
    val mcc = math.round(1e6 * 3500.0 /
      (math.sqrt(4950.0) * math.sqrt(5000.0)))
    assert(r.getLong(5) === mcc)
    // single-cell table: perfect accuracy, kappa/MCC undefined
    val one = EvalOps.multiclassSummary(
      Seq((0L, 0L, 10L)).toDF("label", "pred", "cnt"),
      "label", "pred", "cnt").collect().head
    assert(one.getLong(2) === 1000000L &&
      one.getLong(3) === 1000000L)
    assert(one.isNullAt(4) && one.isNullAt(5))
    // phantom predictions and never-predicted classes both count
    // in the class domain (k=2 here, one diagonal cell empty)
    val ph = EvalOps.multiclassSummary(
      Seq((0L, 1L, 10L)).toDF("label", "pred", "cnt"),
      "label", "pred", "cnt").collect().head
    assert(ph.getLong(1) === 2L && ph.getLong(2) === 0L &&
      ph.getLong(3) === 0L)
  }

  test("calibrationEce: a cleanly separable fixture occupies the " +
       "edge bins with a small ECE; bin accounting is exact") {
    val rows = (1 to 400).map { i =>
      val hi = i % 2 == 0
      (if (hi) 100L else 0L, hi)
    }
    val df = rows.toDF("score", "y")
    val out = EvalOps.calibrationEce(df, "score", "y", iters = 6,
      bins = 10).orderBy("bin").collect()
    val bins = out.map(_.getLong(0)).toSeq
    assert(bins === Seq(0L, 9L),
      s"saturated fit must occupy only the edge bins, got $bins")
    assert(out.map(_.getLong(1)).sum === 400L, "bin counts sum to n")
    // low bin: no positives; high bin: all positives
    assert(out(0).getLong(2) === 0L && out(1).getLong(2) === 200L)
    assert(out(0).getLong(4) === 0L && out(1).getLong(4) === 1000000L)
    val ece = out.head.getLong(7)
    assert(ece < 50000L, s"separable fit should calibrate, ece=$ece")
    // ECE is the n_b-weighted mean gap — never above the max gap
    assert(ece <= out.map(_.getLong(5)).max + 1)
    intercept[IllegalArgumentException] {
      EvalOps.calibrationEce(df, "score", "y", iters = 0, bins = 10)
    }
    intercept[IllegalArgumentException] {
      EvalOps.calibrationEce(df, "score", "y", iters = 6, bins = 0)
    }
  }

  test("restart-safe stream scoring: two checkpointed phases land " +
       "every prediction EXACTLY ONCE and match the batch twin") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Paths.get("target/spec_stream_score_restart")
    Fs.deleteRecursively(base)
    val src = base.resolve("src"); Files.createDirectories(src)
    val ckpt = base.resolve("ckpt").toString
    val out = base.resolve("out").toString
    val df = fixture()
    // the persisted artifact drives BOTH phases (fit once, serve many)
    val artPath = base.resolve("beta").toString
    val labels = Seq(0L, 1L, 2L)
    val fit = EvalOps.logisticOvrBetas(df, "x1", "x2", "lab",
        labels, 3)
      .orderBy("label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    FitArtifacts.saveGlmBetas(spark, artPath, fit)
    val betas = FitArtifacts.loadGlmBetas(spark, artPath, labels)
      .map(_._2)
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
        df.schema, src.toString)
      val scored = stream.select(col("id"),
        EvalOps.ovrPredExpr(col("x1"), col("x2"), labels, betas)
          .as("pred"))
      graft.streaming.StreamOps.runFileSinkPhase(scored, ckpt, out,
        statePartitions = Some(4))
    }
    stage(df.filter(col("id") <= 300), "p1")
    runPhase()
    val after1 = spark.read.parquet(out)
    assert(after1.count() === 300L,
      "phase 1 must land exactly the first half")
    // phase 2: ONLY the new file is ingested (the commit log skips
    // p1), and the union of both phases is the batch scoring exactly
    stage(df.filter(col("id") > 300), "p2")
    runPhase()
    val landed = spark.read.parquet(out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(landed.size === 600, "every row exactly once across restart")
    assert(landed.toMap.size === 600, "no duplicated ids")
    val batch = df.select(col("id"),
        EvalOps.ovrPredExpr(col("x1"), col("x2"), labels, betas)
          .as("pred"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(landed.toMap === batch,
      "landed stream predictions must equal the batch twin exactly")
  }
}
