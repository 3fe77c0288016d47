package graft

import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, SimilarityOps}

/** ANN operators (brute-force baseline vs LSH scale path) and the
  * confusion-matrix / multiclass-metric aggregates (A11/A12) checked
  * against MLlib's own evaluator. */
class SimilarityAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // three tight clusters in 4-d so exact neighbors are unambiguous
  private def clustered = {
    val rnd = new scala.util.Random(3)
    val centers = Seq(Seq(10.0, 0, 0, 0), Seq(0.0, 10, 0, 0),
      Seq(0.0, 0, 10, 0))
    (0 until 60).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.1))
    }.toDF("vec_id", "embedding")
  }

  test("bruteForceTopK returns same-cluster neighbors first") {
    val df = clustered
    val q = df.filter(col("vec_id") < 3)
    val top = SimilarityOps.bruteForceTopK(q, df, "vec_id", "embedding", 5)
    top.collect().foreach { r =>
      val qid = r.getLong(r.fieldIndex("query_id"))
      val nid = r.getLong(r.fieldIndex("neighbor_id"))
      assert(qid % 3 === nid % 3,
        s"neighbor $nid of $qid crosses clusters")
      assert(r.getDouble(r.fieldIndex("sim")) > 0.99)
    }
  }

  test("lshTopK results are a subset of exact sims and deterministic") {
    val df = clustered
    val q = df.filter(col("vec_id") < 3)
    def run() = SimilarityOps.lshTopK(q, df, "vec_id", "embedding", 5,
        planes = 6, seed = 42L)
      .select("query_id", "neighbor_id", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = run()
    assert(a === run())               // seeded hyperplanes ⇒ reproducible
    assert(a.nonEmpty)
    a.foreach { case (qid, nid, _) => assert(qid % 3 === nid % 3) }
  }

  test("cosineNearDupPairs ⊆ exact near-dup pairs (LSH adds no false " +
       "positives after in-bucket exact scoring)") {
    val df = clustered
    val lsh = SimilarityOps.cosineNearDupPairs(df, "vec_id", "embedding",
        threshold = 0.99, planes = 6, seed = 42L)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    // exact pairs at the same threshold via the fused expression
    val v = df.select(col("vec_id"), col("embedding"))
    val exact = v.toDF("id_a", "_va")
      .crossJoin(v.toDF("id_b", "_vb"))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.functions.GraftFunctions
        .cosine_sim(col("_va"), col("_vb")) >= 0.99)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("multi-table lshTopK: more tables never lose candidates and lift " +
       "recall toward exact") {
    val df = clustered
    val q = df.filter(col("vec_id") < 6)
    val exact = SimilarityOps.bruteForceTopK(q, df, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(tables: Int): Double = {
      val got = SimilarityOps.lshTopK(q, df, "vec_id", "embedding", 3,
          planes = 10, seed = 42L, tables = tables)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    val r1 = recallAt(1)
    val r4 = recallAt(4)
    assert(r4 >= r1, s"recall must not drop with more tables: $r1 -> $r4")
    assert(r4 > 0.8, s"4-table recall $r4")
  }

  test("ivfTopK: high recall vs brute force on clustered data") {
    val df = clustered
    val q = df.filter(col("vec_id") < 6)
    val exact = SimilarityOps.bruteForceTopK(q, df, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps.ivfTopK(q, df, "vec_id", "embedding", 3,
        nlist = 4, nprobe = 2, seed = 42L)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // clusters are tight → the probed lists contain the true neighbors
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall")
  }

  test("confusionMatrix pivots grouped counts") {
    val preds = Seq((0.0, 0.0), (0.0, 0.0), (0.0, 1.0), (1.0, 1.0),
      (1.0, 0.0), (1.0, 1.0)).toDF("label", "prediction")
    val cm = AggOps.confusionMatrix(preds, "label", "prediction").collect()
    // row label=0: predicted 0 twice, 1 once
    assert(cm(0).getLong(1) === 2L)
    assert(cm(0).getLong(2) === 1L)
    assert(cm(1).getLong(1) === 1L)
    assert(cm(1).getLong(2) === 2L)
  }

  test("multiclassMetrics agrees with MulticlassClassificationEvaluator") {
    val rnd = new scala.util.Random(5)
    val preds = (0 until 300).map { _ =>
      val label = rnd.nextInt(3).toDouble
      // 80% correct, otherwise uniform wrong class
      val pred = if (rnd.nextDouble() < 0.8) label
        else ((label.toInt + 1 + rnd.nextInt(2)) % 3).toDouble
      (label, pred)
    }.toDF("encoded_label", "prediction")
    val ours = AggOps.multiclassMetrics(preds, "encoded_label", "prediction")
      .collect().map(r => r.getDouble(r.fieldIndex("cls")) -> r).toMap
    val ev = new MulticlassClassificationEvaluator()
      .setLabelCol("encoded_label").setPredictionCol("prediction")
    val acc = ev.setMetricName("accuracy").evaluate(preds)
    assert(math.abs(ours(0.0).getDouble(
      ours(0.0).fieldIndex("accuracy")) - acc) < 1e-9)
    for (cls <- Seq(0.0, 1.0, 2.0)) {
      val p = ev.setMetricName("precisionByLabel").setMetricLabel(cls)
        .evaluate(preds)
      val r = ev.setMetricName("recallByLabel").setMetricLabel(cls)
        .evaluate(preds)
      val row = ours(cls)
      assert(math.abs(row.getDouble(row.fieldIndex("precision")) - p) < 1e-9)
      assert(math.abs(row.getDouble(row.fieldIndex("recall")) - r) < 1e-9)
    }
  }

  test("frequencyIndex assigns dense codes by descending frequency") {
    val df = Seq("b", "a", "a", "a", "c", "b").toDF("s")
    val idx = AggOps.frequencyIndex(df, "s")
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(idx === Map("a" -> 0, "b" -> 1, "c" -> 2))
  }
}
