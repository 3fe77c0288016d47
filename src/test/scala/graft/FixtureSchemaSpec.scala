package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema drift guard (round-7 postmortem): the driver
  * regenerated `events.parquet` with `ts` as `timestamp[us]` NTZ where
  * it used to be INT64 TIMESTAMP(NANOS), and 21 event-time queries
  * failed analysis before any spec noticed. This suite pins the LOGICAL
  * schema `Tables.load` must yield — whatever physical encoding the
  * generator picked — so the next regeneration fails one cheap spec
  * here instead of a dozen queries at the driver's correctness gate. */
class FixtureSchemaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("events.ts loads as TimestampType regardless of fixture encoding") {
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TimestampType (LTZ); got " +
        s"${df.schema("ts").dataType} — extend Tables.normalizeTs")
  }

  test("withTimestamps normalizes a pinned-schema stream read the same way") {
    // exactly the streaming path: batch-read the fixture under the raw
    // pinned schema, then normalize — the type must match Tables.load
    val raw = spark.read.schema(Tables.rawSchema(spark, dir, "events"))
      .parquet(s"$dir/events.parquet")
    val df = Tables.withTimestamps(raw, "events")
    assert(df.schema("ts").dataType == TimestampType)
  }

  test("NTZ relabel is value-exact under the pinned UTC session timezone") {
    // same micros payload whether read as NTZ-cast-LTZ or via unix micros
    val df = Tables.load(spark, dir, "events")
      .select(unix_micros(col("ts")).as("us"))
    val viaRaw = spark.read.parquet(s"$dir/events.parquet")
    val rawUs = viaRaw.schema("ts").dataType match {
      case TimestampNTZType =>
        // localtimestamp semantics: NTZ micros field is the wall-clock
        // payload; casting under UTC must not shift it
        viaRaw.select(
          unix_micros(col("ts").cast(TimestampType)).as("us"))
      case LongType => // legacy nanos layout
        viaRaw.select(expr("ts div 1000").as("us"))
      case TimestampType => viaRaw.select(unix_micros(col("ts")).as("us"))
      case other => fail(s"unhandled fixture encoding $other")
    }
    assert(df.exceptAll(rawUs).isEmpty && rawUs.exceptAll(df).isEmpty)
  }

  test("legacy nanos-long layout still normalizes (old fixture generations)") {
    // Under `nanosAsLong`, parquet INT64 TIMESTAMP(NANOS) surfaces as a
    // plain LongType column — synthesize that post-read shape and check
    // the normalization still rebuilds exact micros. Integer-division
    // exactness matters: epoch-nanos exceed a double's 53-bit mantissa.
    import spark.implicits._
    val nanos = Seq(1700000000123456789L, 1700000001987654321L)
    val legacy = nanos.toDF("ts")
    val out = Tables.withTimestamps(legacy, "events")
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).as[Long].collect().toSeq
    assert(got == nanos.map(_ / 1000L))
  }

  /** The full pinned logical schema per table — column names + types as
    * every operator in the engine assumes them. A driver-side fixture
    * regeneration that changes any of these should fail HERE. */
  private val pinned: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  test("pinned logical schemas hold for every guarded table at sf0.001") {
    pinned.foreach { case (table, cols) =>
      val schema = Tables.load(spark, dir, table).schema
      cols.foreach { case (name, tpe) =>
        assert(schema.fieldNames.contains(name),
          s"$table: missing column $name (schema: ${schema.treeString})")
        assert(schema(name).dataType == tpe,
          s"$table.$name: expected $tpe, got ${schema(name).dataType}")
      }
    }
  }
}
