package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification._
import org.apache.spark.ml.feature.{MinMaxScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's ML pipeline re-expressed as a single `ml.Pipeline`
  * (SURVEY.md §2.10 U2/U3): VectorAssembler → MinMaxScaler →
  * StringIndexer → classifier, with the four estimator families the
  * reference trains (`/root/reference/src/modelling.py:113-150`):
  * DecisionTree, RandomForest, NaiveBayes(multinomial, smoothing=1.0),
  * MultilayerPerceptron(maxIter=100, blockSize=128, seed=1234).
  *
  * fit() is batch (aggregate passes over the data); the fitted
  * `PipelineModel.transform` is a pure projection — streaming-safe, used
  * by [[graft.streaming.StreamOps]] for scoring.
  */
object IdsPipeline {

  sealed trait Algo
  case object DT extends Algo
  case object RF extends Algo
  case object NB extends Algo
  case object MLP extends Algo

  /** Assemble numeric feature columns + scale + index label + train. */
  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String,
          algo: Algo, mlpHidden: Seq[Int] = Seq(16)): PipelineModel = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features_raw")
      .setHandleInvalid("skip")
    val scaler = new MinMaxScaler()
      .setInputCol("features_raw").setOutputCol("features")
    val indexer = new StringIndexer()
      .setInputCol(labelCol).setOutputCol("encoded_label")
      .setStringOrderType("frequencyDesc").setHandleInvalid("skip")
    val stages = Seq(assembler, scaler, indexer) :+ classifier(
      algo, train, labelCol, featureCols.size, mlpHidden)
    new Pipeline().setStages(stages.toArray).fit(train)
  }

  /** The classifier stage alone, reference-matched settings
    * (`/root/reference/src/modelling.py:113-150`) — public so
    * [[graft.BenchMl]] can time the classifier fit/score in isolation
    * (the reference's published wall times cover exactly that: its
    * notebook assembles features in earlier cells and `%%time`s only
    * the fit/predict/evaluate cells). */
  def classifier(algo: Algo, train: DataFrame, labelCol: String,
                 nFeatures: Int, mlpHidden: Seq[Int]) = algo match {
    case DT => new DecisionTreeClassifier()
      .setLabelCol("encoded_label").setFeaturesCol("features").setSeed(42L)
    case RF => new RandomForestClassifier()
      .setLabelCol("encoded_label").setFeaturesCol("features").setSeed(42L)
    case NB => new NaiveBayes()
      .setLabelCol("encoded_label").setFeaturesCol("features")
      .setModelType("multinomial").setSmoothing(1.0)
    case MLP =>
      val k = train.select(labelCol).distinct().count().toInt
      new MultilayerPerceptronClassifier()
        .setLabelCol("encoded_label").setFeaturesCol("features")
        .setLayers((nFeatures +: mlpHidden :+ k).toArray)
        .setMaxIter(100).setBlockSize(128).setSeed(1234L)
  }

  /** Expand an array<float|double> embedding column into a features
    * DataFrame suitable for [[fit]] via a single vector column —
    * avoids exploding to N scalar columns. */
  def withArrayFeatures(df: DataFrame, arrayCol: String): DataFrame =
    df.withColumn("features_raw",
      array_to_vector(col(arrayCol).cast("array<double>")))

  /** Fit directly on an array-embedding column (skips the assembler). */
  def fitOnArray(train: DataFrame, arrayCol: String, labelCol: String,
                 algo: Algo, mlpHidden: Seq[Int] = Seq(16)): PipelineModel = {
    val prepared = withArrayFeatures(train, arrayCol)
    val scaler = new MinMaxScaler()
      .setInputCol("features_raw").setOutputCol("features")
    val indexer = new StringIndexer()
      .setInputCol(labelCol).setOutputCol("encoded_label")
      .setStringOrderType("frequencyDesc").setHandleInvalid("skip")
    val dim = prepared.select(col(arrayCol)).head
      .getAs[scala.collection.Seq[_]](0).size
    val stages = Seq(scaler, indexer) :+ classifier(
      algo, prepared, labelCol, dim, mlpHidden)
    new Pipeline().setStages(stages.toArray).fit(prepared)
  }

  /** Score + evaluate: returns the per-class metric table from
    * [[graft.ops.AggOps.multiclassMetrics]]. */
  def evaluate(model: PipelineModel, test: DataFrame,
               arrayCol: Option[String] = None): DataFrame = {
    val prepared = arrayCol.map(withArrayFeatures(test, _)).getOrElse(test)
    val scored = model.transform(prepared)
    graft.ops.AggOps.multiclassMetrics(scored, "encoded_label", "prediction")
  }

  /** Score UNLABELED data (the production-stream case): apply every
    * fitted stage except the label indexer, which would demand the
    * label column the stream doesn't have. The classifier only needs
    * `features`; `encoded_label` exists purely for training/eval. */
  def scoreUnlabeled(model: PipelineModel, df: DataFrame,
                     arrayCol: Option[String] = None): DataFrame = {
    val prepared = arrayCol.map(withArrayFeatures(df, _)).getOrElse(df)
    model.stages
      .filterNot(_.isInstanceOf[
        org.apache.spark.ml.feature.StringIndexerModel])
      .foldLeft(prepared)((d, stage) => stage.transform(d))
  }

  /** The reference's END-TO-END flow (`/root/reference/src/modelling.py`
    * entry points 1-3) as one composite over a dirty flow table:
    *
    *  1. sentinel-probe +∞ columns — mask ∞ with −100, take the max to
    *     discover the true finite ceiling (`modelling.py:61-68`, A1/U1);
    *  2. replace ±∞ with that ceiling; median-impute remaining nulls
    *     (`Imputer`, `modelling.py:74-76`, A8);
    *  3. stratified 'fraction' sample per label = validation, train =
    *     anti-join remainder (`modelling.py:85-98`, R1/R3/J1);
    *  4. assemble → MinMax-scale → frequency-index label → train
    *     `algo` → per-class metrics (U2/U3/A11/A12).
    *
    * Returns (metricsTable, fittedModel). Every step is the library
    * operator, so this is also the parity demonstration: a reference
    * user switches by calling this with their flow DataFrame.
    */
  def runEndToEnd(flows: DataFrame, featureCols: Seq[String],
                  labelCol: String, idCol: String,
                  validFraction: Double = 0.1, seed: Long = 42L,
                  algo: Algo = DT): (DataFrame, PipelineModel) = {
    import graft.ops.{CleanOps, SplitOps}
    import org.apache.spark.sql.functions._
    // NaN → null up front: Spark's `max` orders NaN ABOVE every double,
    // so a column holding both NaN and +∞ would otherwise report NaN as
    // its "finite ceiling"; null-ing NaN also lets the median impute
    // treat it as missing (the reference's Imputer default)
    val flowsNn = featureCols.foldLeft(flows)((df, c) =>
      df.withColumn(c,
        when(isnan(col(c)), lit(null).cast("double"))
          .otherwise(col(c))))
    // 1: which columns carry +∞, and what is the finite max of each?
    val masked = featureCols.map(c =>
      max(CleanOps.replaceInf(col(c), lit(-100.0))).as(c))
    val ceilings = flowsNn.select(masked: _*).head()
    // 2: replace ±∞ per column with its finite ceiling, then impute
    val definite = featureCols.zipWithIndex.foldLeft(flowsNn) {
      case (df, (c, i)) =>
        if (ceilings.isNullAt(i)) df
        else df.withColumn(c,
          CleanOps.replaceInf(col(c), lit(ceilings.getDouble(i))))
    }
    val imputed = CleanOps.medianFillApprox(definite, featureCols)
    // 3: stratified validation + anti-join train
    val (train, valid) = SplitOps.antiJoinSplit(
      imputed, idCol, labelCol, validFraction, seed)
    // 4: featurize + fit + evaluate
    val model = fit(train, featureCols, labelCol, algo)
    (evaluate(model, valid), model)
  }
}
