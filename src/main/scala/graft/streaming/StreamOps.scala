package graft.streaming

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming layer (SURVEY.md §2.11): the reference is pure
  * batch, but the problem is stream-shaped (flows arrive continuously;
  * the dashboard consumes live predictions) — BASELINE.json mandates
  * this surface.
  *
  * Batch operators re-expressed over `readStream`:
  *  - stateless transforms (projections/filters/cleaning) — unchanged;
  *  - fitted `PipelineModel.transform` for scoring (fit stays batch);
  *  - tumbling/sliding windowed counts with watermarks for late data;
  *  - `foreachBatch` sink (stand-in for the reference's Cassandra sink,
  *    `/root/reference/src/spark_to_cassandra.py:22-30`).
  *
  * Scale notes: windowed aggregation state is partitioned by (window,
  * keys) across executors; the watermark bounds state size — without it
  * a 100 TB stream accumulates state forever.
  */
object StreamOps {

  /** File-based stream source with a pinned schema (inference is
    * disallowed on streams — and a perf bug on batch, SURVEY §2.1 S1). */
  def fileStream(spark: SparkSession, schema: StructType, path: String,
                 format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).format(format).load(path)

  /** Tumbling-window event counts with a watermark: the dashboard's
    * per-interval label counts (SURVEY §2.11). */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowDur: String, watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Sliding-window variant. */
  def slidingCounts(events: DataFrame, tsCol: String, keyCol: String,
                    windowDur: String, slideDur: String,
                    watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur, slideDur), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** Score a stream with a batch-fitted model and deliver each
    * micro-batch to `sink` (the foreachBatch stand-in for Cassandra). */
  def scoreStream(stream: DataFrame, model: PipelineModel,
                  sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(model.transform(batch), id)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Run a streaming aggregation over a static directory to completion
    * (AvailableNow + memory sink) and return the final result as a
    * batch DataFrame — lets the DuckDB oracle check streaming results.
    * `complete` output mode so open windows are included. */
  def runToCompletion(agg: DataFrame, queryName: String): DataFrame = {
    val spark = agg.sparkSession
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
