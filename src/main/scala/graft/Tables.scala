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
  * Timestamp normalization: the engine's event-time layer (watermarks,
  * `cast(ts as double)`, `unix_micros`) requires TimestampType (LTZ).
  * Fixture generations have stored `events.ts` two different ways, and
  * [[load]]/[[withTimestamps]] normalize both to TimestampType:
  *
  *  - parquet INT64 TIMESTAMP(NANOS), which Spark 4's reader rejects
  *    outright (PARQUET_TYPE_ILLEGAL). We read it under
  *    `spark.sql.legacy.parquet.nanosAsLong` (nanos surface as a plain
  *    LongType) and rebuild TimestampType via integer `div 1000` →
  *    micros. Integer division, not `/1000`: epoch-nanos (~1.7e18)
  *    exceed a double's 53-bit mantissa, so the float path would
  *    corrupt timestamps by up to ~256 ns.
  *  - parquet `timestamp[us]` with isAdjustedToUTC=false, which Spark 4
  *    reads as TIMESTAMP_NTZ (the current fixture layout). Under the
  *    engine's pinned UTC session timezone, `cast(TimestampType)` is a
  *    value-exact relabel (same micros payload, no wall-clock shift).
  *
  * Any other encoding of a declared timestamp column fails loudly in
  * [[load]] — a silently-untouched `ts` resurfaces 21 queries later as
  * analysis errors (round-7 postmortem).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Declared event-time columns per table — normalized to TimestampType
    * at load whatever parquet encoding the fixture generation used. */
  private val nanosCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"))

  /** Enable the legacy nanos-as-long parquet read on this session.
    * Runtime-settable SQLConf; idempotent. */
  def enableNanosRead(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Normalize one declared timestamp column to TimestampType, whatever
    * the fixture stored. `strict=true` (batch load) rejects unknown
    * encodings; streams pass strict too — both paths must converge on
    * TimestampType or the watermark layer breaks downstream. */
  private def normalizeTs(df: DataFrame, c: String): DataFrame =
    if (!df.schema.fieldNames.contains(c)) df
    else df.schema(c).dataType match {
      case LongType => // legacy INT64 TIMESTAMP(NANOS) via nanosAsLong
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case TimestampNTZType => // current timestamp[us] NTZ layout:
        // exact relabel under the pinned UTC session timezone
        df.withColumn(c, col(c).cast(TimestampType))
      case TimestampType => df // already the engine's canonical type
      case other => throw new IllegalStateException(
        s"fixture column $c has unsupported timestamp encoding $other; " +
          "extend Tables.normalizeTs rather than letting event-time " +
          "queries fail analysis one by one")
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    enableNanosRead(spark)
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    nanosCols.getOrElse(name, Nil).foldLeft(raw)(normalizeTs)
  }

  /** The raw (pre-conversion) schema of a table as the parquet reader
    * sees it — what a pinned-schema `readStream` must declare. Streaming
    * callers convert nanos-long cols with [[withTimestamps]]. */
  def rawSchema(spark: SparkSession, dir: String, name: String): StructType = {
    enableNanosRead(spark)
    spark.read.parquet(s"$dir/$name.parquet").schema
  }

  /** Normalize this table's declared timestamp columns to TimestampType
    * (for streams read with [[rawSchema]] — same conversion as [[load]],
    * covering both the legacy nanos-long and current NTZ layouts). */
  def withTimestamps(df: DataFrame, name: String): DataFrame =
    nanosCols.getOrElse(name, Nil).foldLeft(df)(normalizeTs)

  /** Batch CSV scan with a pinned schema (SURVEY §2.1 S1/S2 — the
    * reference's only ingest path, `/root/reference/src/modelling.py:50`,
    * minus its schema-inference pass). Multi-path reads are an implicit
    * UNION ALL of per-file scans (J2). */
  def loadCsv(spark: SparkSession, schema: StructType,
              paths: Seq[String], header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).schema(schema)
      .csv(paths: _*)
}
