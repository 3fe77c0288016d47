package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.IdsPipeline
import graft.ops.AggOps

/** The reference's whole pipeline on CIC-IDS-shaped data: a dirty flow
  * table (NaN, +∞, nulls, a string label) through clean → sentinel
  * probe → impute → stratified split → featurize → train → confusion
  * matrix, all via library operators (`/root/reference/src/modelling.py`
  * end to end). This is the "switch from the reference" proof.
  */
class IdsEndToEndSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 3-class flow records: label decides the regime of 6 numeric
  // features; pathologies injected like the real CIC-IDS CSVs
  // (Flow Byts/s NaN, Flow Pkts/s +Infinity)
  private def flows = {
    val rnd = new scala.util.Random(17)
    val labels = Seq("Benign", "FTP-BruteForce", "SSH-BruteForce")
    (0 until 3000).map { i =>
      val cls = i % 3
      val base = (cls + 1) * 10.0
      def f() = base + rnd.nextGaussian()
      val bytsPerS =
        if (rnd.nextDouble() < 0.02) Double.NaN else f() * 100
      val pktsPerS =
        if (rnd.nextDouble() < 0.02) Double.PositiveInfinity else f() * 10
      val durOpt =
        if (rnd.nextDouble() < 0.02) None else Some(f() * 1000)
      (i.toLong, f(), f(), bytsPerS, pktsPerS, durOpt, labels(cls))
    }.toDF("row_id", "fwd_pkts", "bwd_pkts", "flow_byts_s",
      "flow_pkts_s", "flow_duration", "label")
      // NaN → null first, as the reference's Imputer expects
      .withColumn("flow_byts_s",
        when(isnan(col("flow_byts_s")), lit(null)).otherwise(col("flow_byts_s")))
  }

  private val features = Seq("fwd_pkts", "bwd_pkts", "flow_byts_s",
    "flow_pkts_s", "flow_duration")

  test("end-to-end: dirty flows → cleaned → trained DT → accuracy > 0.9") {
    val (metrics, model) = IdsPipeline.runEndToEnd(
      flows, features, "label", "row_id",
      validFraction = 0.2, seed = 7L, algo = IdsPipeline.DT)
    val rows = metrics.collect()
    assert(rows.length === 3, "one metric row per class")
    val acc = rows.head.getDouble(rows.head.fieldIndex("accuracy"))
    assert(acc > 0.9, s"accuracy $acc")
    // per-class recall present and sane
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("recall")) > 0.8)
    }
    // the fitted model scores new data (streaming-safe transform)
    val scored = model.transform(flows.na.fill(0.0, features)
      .select((features.map(col) :+ col("label")): _*))
    assert(scored.columns.contains("prediction"))
  }

  test("confusion matrix of a good model is diagonal-dominant") {
    val (_, model) = IdsPipeline.runEndToEnd(
      flows, features, "label", "row_id",
      validFraction = 0.2, seed = 7L, algo = IdsPipeline.DT)
    val scored = model.transform(
      graft.ops.CleanOps.medianFillApprox(
        flows.withColumn("flow_pkts_s",
          graft.ops.CleanOps.replaceInf(col("flow_pkts_s"), lit(0.0))),
        features))
    val cm = AggOps.confusionMatrix(scored, "encoded_label", "prediction")
    val rows = cm.collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      val diag = r.getLong(i + 1)
      val offSum = (1 until rows.length + 1)
        .filter(_ != i + 1).map(r.getLong).sum
      assert(diag > offSum, s"class $i diag $diag vs off $offSum")
    }
  }
}
