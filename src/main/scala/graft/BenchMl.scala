package graft

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{MinMaxScaler, StringIndexer, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** ML WALL-TIME BASELINE BENCH (round-12 verdict task 1): the only
  * benchmark numbers the reference actually PUBLISHES are ML
  * train+score wall times on ~1.05 M rows × 80 cols of CIC-IDS-2018
  * (`/root/reference/ISAA_Review_3.ipynb:954,996,1033,1072` — MLP
  * 9 min 26 s, RF 2 min 39 s, DT 2 min 11 s, NB 45 s on a ~2-vCPU
  * Colab runtime, Spark 3.1.2 local[*]). This main reproduces that
  * workload shape like-for-like on a generated CIC-shaped fixture
  * (FIXTURES.md §2 scaled up: 78 numeric features — the reference's
  * MLP layers are [78,4,2,3] — with the NaN / +∞ / null / constant-
  * column pathologies and a skewed 3-class label) and times the SAME
  * region the notebook's `%%time` cells cover: classifier fit +
  * score + accuracy over pre-assembled features (the notebook
  * assembles/scales in earlier, untimed cells).
  *
  * Phases reported separately in the one-line JSON:
  *  - `clean_sec`   — sentinel probe + ∞-replace + median impute +
  *                    stratified 80/20 anti-join split (library ops,
  *                    `IdsPipeline.runEndToEnd` steps 1-3);
  *  - `prep_sec`    — assembler + MinMax scaler + frequency label
  *                    index, fit on train, applied to both splits,
  *                    persisted (the notebook's untimed feature cells);
  *  - per-algo sec  — classifier fit + transform + accuracy agg (the
  *                    published cells' region).
  *
  * Env: SPARK_GRAFT_ML_ROWS (default 1050000), SPARK_GRAFT_ML_ALGOS
  * (default DT,NB,RF,MLP), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_ML_OUT (optional JSON sidecar path). The fixture is
  * generated once under target/ and reused.
  */
object BenchMl {
  private val baselineColabSec = Map(
    "DT" -> 131.0, "NB" -> 45.0, "RF" -> 159.0, "MLP" -> 566.0)

  private def algoOf(s: String): graft.ml.IdsPipeline.Algo = s match {
    case "DT" => ids.DT
    case "NB" => ids.NB
    case "RF" => ids.RF
    case "MLP" => ids.MLP
    case other => throw new IllegalArgumentException(
      s"unknown algo $other (expected DT|NB|RF|MLP)")
  }
  private val ids = graft.ml.IdsPipeline

  /** CIC-shaped fixture: 78 numeric features whose regime is decided
    * by a skewed 3-class label (80/15/5), with the real files'
    * pathologies injected — f2 ~2% NaN, f3 ~2% +∞, f4 ~2% null, f5
    * constant-zero (degenerate min=max scaler input). Generated
    * DISTRIBUTED (spark.range + per-column seeded rand — no driver
    * loop) and written once. */
  private def fixture(spark: SparkSession, rows: Long,
                      parts: Int): String = {
    // parts is part of the cache key: rand(seed) draws are
    // per-partition, so the same row count generated at a different
    // parallelism is DIFFERENT data — a reused fixture must match
    // both (round-12 review)
    val path = s"target/ml_fixture_${rows}_p$parts"
    if (!new java.io.File(path).isDirectory) {
      val cls = when(pmod(col("id"), lit(100)) < 80, 0)
        .when(pmod(col("id"), lit(100)) < 95, 1).otherwise(2)
      val feats = (0 until 78).map { j =>
        val regime = (col("cls") + 1) * (10.0 + j * 0.37)
        val v = regime + rand(42L + j) * 5.0
        (j match {
          case 2 => when(rand(1002L) < 0.02, lit(Double.NaN)).otherwise(v)
          case 3 => when(rand(1003L) < 0.02,
            lit(Double.PositiveInfinity)).otherwise(v)
          case 4 => when(rand(1004L) < 0.02,
            lit(null).cast("double")).otherwise(v)
          case 5 => lit(0.0)
          case _ => v
        }).cast("double").as(s"f$j")
      }
      val label = when(col("cls") === 0, "Benign")
        .when(col("cls") === 1, "FTP-BruteForce")
        .otherwise("SSH-BruteForce")
      spark.range(0, rows, 1, parts)
        .withColumn("cls", cls)
        .select(col("id").as("row_id") +: feats :+ label.as("label"): _*)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Locale-pinned decimal formatting for the JSON line: the `f`
    * interpolator is default-locale-sensitive — under a
    * comma-decimal locale it would emit `"sec":1,234`, invalid JSON
    * (round-13 ADVICE). */
  private def d3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
  private def d5(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.5f", Double.box(v))

  /** JSON string escape for interpolated label names — a label
    * carrying a quote/backslash/control char must not break the one
    * JSON line (round-13 review: same failure class as the locale
    * pin). */
  private def jstr(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_ML_ROWS", "1050000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val algos = sys.env.getOrElse("SPARK_GRAFT_ML_ALGOS", "DT,NB,RF,MLP")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{CleanOps, SplitOps}

    val featureCols = (0 until 78).map(i => s"f$i")
    val flows = spark.read.parquet(fixture(spark, rows, cpus.toInt))

    // ---- clean + split (runEndToEnd steps 1-3, untimed by the
    // reference's cells but reported here for completeness). Unlike
    // the tiny-fixture runEndToEnd, the 80-wide 1M-row table needs
    // plan hygiene: the per-column screens are fused into ONE
    // projection (a 156-deep withColumn fold builds an expression
    // tree Catalyst re-walks per ML stage — measured minutes of pure
    // driver-side analysis), and the cleaned table is STAGED to
    // parquet so the split and every classifier read a flat scan —
    // exactly how a production pipeline lands its silver table. ----
    val t0 = System.nanoTime()
    def nanNulled(c: String) =
      when(isnan(col(c)), lit(null).cast("double")).otherwise(col(c))
    val ceilings = flows.select(featureCols.map(c =>
      max(CleanOps.replaceInf(nanNulled(c), lit(-100.0))).as(c)): _*)
      .head()
    val probeSec = (System.nanoTime() - t0) / 1e9
    val definite = flows.select(
      col("row_id") +: featureCols.zipWithIndex.map { case (c, i) =>
        (if (ceilings.isNullAt(i)) nanNulled(c)
         else CleanOps.replaceInf(nanNulled(c),
           lit(ceilings.getDouble(i)))).as(c)
      } :+ col("label"): _*)
    val tMed = System.nanoTime()
    // medianFillApprox runs one approx-quantile pass over the 78
    // columns (its own job), then the screened+imputed projection is
    // staged to parquet — the write materializes the whole clean plan
    val cleanedPath = s"target/ml_cleaned_$rows"
    CleanOps.medianFillApprox(definite, featureCols)
      .write.mode("overwrite").parquet(cleanedPath)
    val stageSec = (System.nanoTime() - tMed) / 1e9
    val cleaned = spark.read.parquet(cleanedPath)
    val (train, valid) = SplitOps.antiJoinSplit(
      cleaned, "row_id", "label", 0.2, 42L)
    val cleanSec = (System.nanoTime() - t0) / 1e9

    // ---- feature prep (the notebook's untimed assembler cells):
    // fit on train, apply to both, persist so each classifier sees
    // materialized features — matching the reference, whose %%time
    // cells read an already-prepared DataFrame ----
    val t1 = System.nanoTime()
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features_raw")
      .setHandleInvalid("skip")
    val scaler = new MinMaxScaler()
      .setInputCol("features_raw").setOutputCol("features")
    val indexer = new StringIndexer()
      .setInputCol("label").setOutputCol("encoded_label")
      .setStringOrderType("frequencyDesc").setHandleInvalid("skip")
    // fit on the FULL cleaned table, the reference notebook's own
    // convention (it scales the assembled df before splitting) — also
    // what keeps valid-split features inside [0,1], which NaiveBayes
    // requires (a train-fitted scaler leaves valid rows epsilon
    // outside the range)
    val prep = new Pipeline()
      .setStages(Array(assembler, scaler, indexer)).fit(cleaned)
    val trainP = prep.transform(train)
      .select("features", "encoded_label")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val validP = prep.transform(valid)
      .select("features", "encoded_label")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nTrain = trainP.count()
    val nValid = validP.count()
    val prepSec = (System.nanoTime() - t1) / 1e9

    // index → original label name, for the per-label metric keys
    // (frequencyDesc order, so index 0 is the majority class — the
    // reference's "label 0")
    val labelNames = prep.stages(2)
      .asInstanceOf[org.apache.spark.ml.feature.StringIndexerModel]
      .labelsArray(0)

    // ---- per-algo classifier fit + score + accuracy (the published
    // cells' region; reference MLP hidden layers = [4, 2]).
    // Per-label precision/recall (the last reference-published
    // numbers with no engine-side measurement, BASELINE.md label-0
    // rows) come from ONE O(C²) confusion aggregate per algo —
    // outside the timed region, like the notebook's evaluator
    // cells. ----
    val results = algos.map { name =>
      val clf = ids.classifier(algoOf(name), trainP, "encoded_label",
        78, Seq(4, 2))
      val t = System.nanoTime()
      val model = clf.fit(trainP)
      val scored = model.transform(validP)
      val acc = scored.agg(
          avg(when(col("prediction") === col("encoded_label"), 1.0)
            .otherwise(0.0)))
        .head().getDouble(0)
      val sec = (System.nanoTime() - t) / 1e9
      val conf = scored.groupBy("encoded_label", "prediction").count()
        .collect()
        .map(r => ((r.getDouble(0), r.getDouble(1)), r.getLong(2)))
        .toMap
      val perLabel = labelNames.indices.map { l =>
        val li = l.toDouble
        val tp = conf.getOrElse((li, li), 0L)
        val predL = conf.collect { case ((_, p), c) if p == li => c }.sum
        val trueL = conf.collect { case ((tr, _), c) if tr == li => c }.sum
        val prec = if (predL == 0) 0.0 else tp.toDouble / predL
        val rec = if (trueL == 0) 0.0 else tp.toDouble / trueL
        (l, labelNames(l), prec, rec)
      }
      System.err.println(f"[bench-ml] $name%-3s ${sec}%8.2f s  " +
        f"acc=$acc%.5f  (colab baseline ${baselineColabSec(name)}%.0f s)")
      perLabel.foreach { case (l, n2, p, r) =>
        System.err.println(
          s"[bench-ml]   label $l ($n2): precision=${d5(p)} recall=${d5(r)}")
      }
      (name, sec, acc, perLabel)
    }
    val algoJson = results.map { case (n, s, a, pl) =>
      val labelsJson = pl.map { case (l, n2, p, r) =>
        s""""$l":{"label":"${jstr(n2)}","precision":${d5(p)},""" +
          s""""recall":${d5(r)}}"""
      }.mkString(",")
      s""""$n":{"sec":${d3(s)},"accuracy":${d5(a)},""" +
        s""""baseline_colab_sec":${baselineColabSec(n)},""" +
        s""""ratio_vs_colab":${String.format(java.util.Locale.ROOT,
          "%.4f", Double.box(s / baselineColabSec(n)))},""" +
        s""""by_label":{$labelsJson}}"""
    }.mkString(",")
    val json = s"""{"metric":"ml_train_score","rows":$rows,""" +
      s""""n_features":78,"n_train":$nTrain,"n_valid":$nValid,""" +
      s""""cpus":$cpus,"clean_sec":${d3(cleanSec)},""" +
      s""""clean_probe_sec":${d3(probeSec)},""" +
      s""""clean_stage_sec":${d3(stageSec)},""" +
      s""""prep_sec":${d3(prepSec)},"algos":{$algoJson}}"""
    println(json)
    sys.env.get("SPARK_GRAFT_ML_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
