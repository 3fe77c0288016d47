package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-table loader (TESTDATA.md): one parquet per table under a
  * scale-factor dir. Schemas are pinned by the driver's generator; we read
  * them as-is (columnar scan, vectorized reader, pushdown-friendly).
  *
  * The reference infers CSV schemas at read time
  * (`/root/reference/src/modelling.py:50`) — a full extra pass over the
  * data. Here storage is parquet so the schema travels with the footer;
  * at 100 TB, schema inference would be a catastrophic anti-pattern.
  *
  * Nanosecond timestamps: the `events` fixture stores `ts` as parquet
  * INT64 TIMESTAMP(NANOS), which Spark 4's reader rejects outright
  * (PARQUET_TYPE_ILLEGAL). We read it under
  * `spark.sql.legacy.parquet.nanosAsLong` (nanos surface as a plain
  * LongType) and rebuild a proper TimestampType column via integer
  * `div 1000` → micros. Integer division, not `/1000`: epoch-nanos
  * (~1.7e18) exceed a double's 53-bit mantissa, so the float path would
  * corrupt timestamps by up to ~256 ns.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns stored as INT64 TIMESTAMP(NANOS) per table (fixture layout). */
  private val nanosCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"))

  /** Enable the legacy nanos-as-long parquet read on this session.
    * Runtime-settable SQLConf; idempotent. */
  def enableNanosRead(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    enableNanosRead(spark)
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    nanosCols.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      if (df.schema.fieldNames.contains(c) &&
          df.schema(c).dataType == LongType)
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else df
    }
  }

  /** The raw (pre-conversion) schema of a table as the parquet reader
    * sees it — what a pinned-schema `readStream` must declare. Streaming
    * callers convert nanos-long cols with [[withTimestamps]]. */
  def rawSchema(spark: SparkSession, dir: String, name: String): StructType = {
    enableNanosRead(spark)
    spark.read.parquet(s"$dir/$name.parquet").schema
  }

  /** Convert this table's nanos-long columns to TimestampType (for
    * streams read with [[rawSchema]]). */
  def withTimestamps(df: DataFrame, name: String): DataFrame =
    nanosCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema.fieldNames.contains(c) &&
          d.schema(c).dataType == LongType)
        d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else d
    }

  /** Batch CSV scan with a pinned schema (SURVEY §2.1 S1/S2 — the
    * reference's only ingest path, `/root/reference/src/modelling.py:50`,
    * minus its schema-inference pass). Multi-path reads are an implicit
    * UNION ALL of per-file scans (J2). */
  def loadCsv(spark: SparkSession, schema: StructType,
              paths: Seq[String], header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).schema(schema)
      .csv(paths: _*)
}
