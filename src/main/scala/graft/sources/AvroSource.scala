package graft.sources

import java.util.{List => JList, Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, SeekableFileInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal Avro container-file READER as a DataSource V2 table
  * (`spark.read.format("graft-avro")`): the `spark-avro` connector
  * module is not on this classpath, but avro-core is — and Avro is the
  * Kafka-ecosystem wire format a streaming IDS pipeline (the
  * reference's own ingest domain, `/root/reference/src/modelling.py:26-37`
  * reads the same flow records from CSV) actually receives. Supported
  * type subset: boolean / int / long / float / double / string /
  * binary / timestamp (micros logical) / date (date logical over int)
  * / decimal (decimal logical over bytes, precision+scale from the
  * schema) / nested structs (nested records, recursive) / arrays /
  * string-keyed maps (Avro's map contract), each nullable via the
  * standard `union(null, T)` — the fixture tables' type surface plus
  * the envelope shapes (date, decimal, nested, repeated, keyed) a
  * real warehouse feed adds beyond it.
  *
  * Scale shape: one InputPartition per `.avro` container file (the
  * Avro analogue of parquet row-group splits; container blocks could
  * sub-split but per-file is the right granularity for the multi-file
  * layouts [[AvroIO.write]] produces — one file per upstream
  * partition). Column pruning is REAL: Spark's pruned schema becomes
  * the Avro READER schema, so schema resolution decode-skips every
  * unrequested field (row-oriented bytes are still scanned — the
  * format's nature — but no values materialize; `ReadSchema` in
  * `.explain` shows the pruned set). Filters stay in Spark (Avro has
  * no stats to push to).
  */
class AvroSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true

  /** Schema inference opens ONE container header (the writer schema is
    * file metadata — cheap, unlike CSV/JSON full-scan inference), but
    * pinning the schema stays the recommended path (SURVEY §2.1 S1). */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = AvroSource.pathOf(options)
    val first = AvroSource.listAvroFiles(path).headOption.getOrElse(
      throw new IllegalArgumentException(s"no .avro files under $path"))
    val r = new DataFileReader[GenericRecord](
      new SeekableFileInput(new java.io.File(first)),
      new GenericDatumReader[GenericRecord]())
    try AvroSchemas.toStruct(r.getSchema) finally r.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new AvroTable(schema, properties.get("path"))
}

object AvroSource {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-avro requires a load(path)")
    p
  }

  /** Files are listed once on the DRIVER at plan time (the planInput
    * Partitions contract): deterministic order for stable partition
    * ids. */
  def listAvroFiles(path: String): Seq[String] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(p))
      graft.Fs.listDir(p)(_.iterator().asScala
        .map(_.toString).filter(_.endsWith(".avro")).toSeq.sorted)
    else Seq(path)
  }
}

/** StructType ↔ Avro Schema for the supported subset. Kept separate so
  * the writer ([[AvroIO]]) and reader agree on one mapping. Nested
  * records and arrays map recursively (a Kafka feed's envelope is
  * routinely a record of records with repeated fields); nested record
  * names are derived from the field path — Avro requires every record
  * schema in a file to carry a unique full name. */
object AvroSchemas {
  private def baseSchema(dt: DataType, path: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      // Avro `date` logical: int days since epoch — exactly
      // Spark's internal DateType representation
      org.apache.avro.LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))
    case d: DecimalType =>
      // Avro `decimal` logical over bytes: big-endian two's
      // -complement unscaled value; precision/scale ride the schema
      org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case st: StructType => toAvro(st, path)
    case ArrayType(elem, containsNull) =>
      // array elements get the same union-null treatment as fields
      val e = baseSchema(elem, s"${path}_item")
      Schema.createArray(if (containsNull)
        Schema.createUnion(List(Schema.create(Schema.Type.NULL), e).asJava)
      else e)
    case MapType(StringType, value, valueContainsNull) =>
      // Avro maps are string-keyed by definition — exactly the
      // feature-store map shape (q93); non-string keys are rejected
      val v = baseSchema(value, s"${path}_value")
      Schema.createMap(if (valueContainsNull)
        Schema.createUnion(List(Schema.create(Schema.Type.NULL), v).asJava)
      else v)
    case other => throw new IllegalArgumentException(
      s"graft-avro does not map ${other.simpleString}")
  }

  def toAvro(struct: StructType, recordName: String): Schema = {
    val nullSchema = Schema.create(Schema.Type.NULL)
    val fields: JList[Schema.Field] = struct.fields.map { f =>
      val base = baseSchema(f.dataType, s"${recordName}_${f.name}")
      val sch = if (f.nullable)
        Schema.createUnion(List(nullSchema, base).asJava) else base
      new Schema.Field(f.name, sch, null, null)
    }.toList.asJava
    Schema.createRecord(recordName, null, "graft", false, fields)
  }

  private def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"unsupported union $s")
      (nonNull.head, true)
    } else (s, false)

  /** The non-null branch of a `union(null, T)` (or the schema itself)
    * — shared with [[AvroIO]] so writer and reader unwrap unions with
    * one implementation. */
  private[sources] def nonNull(s: Schema): Schema = unwrap(s)._1

  private def toDataType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType != null &&
          s.getLogicalType.getName == "date") DateType
      else IntegerType
    case Schema.Type.LONG =>
      if (s.getLogicalType != null &&
          s.getLogicalType.getName == "timestamp-micros") TimestampType
      else LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => s.getLogicalType match {
      case d: org.apache.avro.LogicalTypes.Decimal =>
        DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.RECORD => toStruct(s)
    case Schema.Type.ARRAY =>
      val (elem, containsNull) = unwrap(s.getElementType)
      ArrayType(toDataType(elem), containsNull)
    case Schema.Type.MAP =>
      val (value, valueContainsNull) = unwrap(s.getValueType)
      MapType(StringType, toDataType(value), valueContainsNull)
    case other => throw new IllegalArgumentException(
      s"graft-avro does not map avro $other")
  }

  def toStruct(schema: Schema): StructType =
    StructType(schema.getFields.asScala.map { f =>
      val (s, nullable) = unwrap(f.schema())
      StructField(f.name(), toDataType(s), nullable)
    }.toArray)
}

class AvroTable(schema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-avro:$path"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new AvroScanBuilder(schema, path,
    Option(options.get("maxFilesPerTrigger")).map(_.toInt))
}

class AvroScanBuilder(schema: StructType, path: String,
                      maxFilesPerTrigger: Option[Int])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new AvroScan(required, path, maxFilesPerTrigger)
}

case class AvroInputPartition(file: String) extends InputPartition

class AvroScan(required: StructType, path: String,
               maxFilesPerTrigger: Option[Int]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro $path ReadSchema: ${required.simpleString}"
  override def planInputPartitions(): Array[InputPartition] =
    AvroSource.listAvroFiles(path).map(AvroInputPartition(_)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required.json)
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new AvroMicroBatchStream(path, required.json, maxFilesPerTrigger)
}

/** Stream offset = count of container files consumed, in sorted-name
  * order (the staging layouts pin names; a production landing dir
  * would use ingest-sequence names the same way). */
case class AvroStreamOffset(idx: Int) extends Offset {
  override def json(): String = idx.toString
}

/** Micro-batch read over a directory of container files — the
  * `readStream.format("graft-avro")` path (SURVEY §2.11's source
  * surface on the Kafka wire format). Files are immutable-once-landed
  * and consumed in sorted-name order; `maxFilesPerTrigger` caps files
  * per batch through the standard admission-control API (this is what
  * turns a staged directory into a deterministic multi-batch replay,
  * exactly like the built-in file source's option). Offsets are plain
  * file counts — restart-safe via the offset log; `commit` is a no-op
  * because the source is the durable store.
  *
  * SupportsTriggerAvailableNow is implemented DIRECTLY (the built-in
  * file source's pattern): Spark's generic AvailableNow wrapper
  * returns its full snapshot from `latestOffset(start, limit)` and
  * IGNORES the read limit (AvailableNowDataStreamWrapper — verified
  * in 4.1.2 bytecode), which would collapse a maxFilesPerTrigger
  * replay into one batch. Here `prepareForTriggerAvailableNow`
  * snapshots the file count and the admission-controlled latestOffset
  * advances at most `maxFilesPerTrigger` files per batch, capped at
  * the snapshot — multi-batch drain, then clean termination. */
class AvroMicroBatchStream(path: String, requiredJson: String,
                           maxFilesPerTrigger: Option[Int])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  private def files: Seq[String] = AvroSource.listAvroFiles(path)
  // end-of-stream snapshot under Trigger.AvailableNow; None = live
  @volatile private var snapshot: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    snapshot = Some(files.size)
  override def initialOffset(): Offset = AvroStreamOffset(0)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[AvroStreamOffset].idx
    val total = snapshot.getOrElse(files.size)
    limit match {
      case mf: ReadMaxFiles =>
        AvroStreamOffset(math.min(total, s + mf.maxFiles()))
      case _ => AvroStreamOffset(total)
    }
  }
  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] =
    files.slice(start.asInstanceOf[AvroStreamOffset].idx,
        end.asInstanceOf[AvroStreamOffset].idx)
      .map(AvroInputPartition(_)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(requiredJson)
  override def deserializeOffset(json: String): Offset =
    AvroStreamOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The factory ships to executors; the pruned schema travels as JSON
  * (StructType is not serializable-stable across Spark versions). */
class AvroReaderFactory(requiredJson: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val required =
      DataType.fromJson(requiredJson).asInstanceOf[StructType]
    new AvroPartitionReader(
      partition.asInstanceOf[AvroInputPartition].file, required)
  }
}

/** Reads one container file; the pruned StructType becomes the Avro
  * READER schema, so resolution skips unrequested fields at decode
  * time (including nested record fields — resolution matches by
  * name recursively). Values convert avro-internal → Spark-internal
  * (Utf8 → UTF8String, ByteBuffer → Array[Byte], timestamp-micros
  * long rides through — Spark's internal timestamp IS micros; nested
  * records recurse into GenericInternalRow, arrays into
  * GenericArrayData). */
class AvroPartitionReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val readerSchema = AvroSchemas.toAvro(required, "graft_record")
  private val datumReader =
    new GenericDatumReader[GenericRecord](null, readerSchema)
  private val reader = new DataFileReader[GenericRecord](
    new SeekableFileInput(new java.io.File(file)), datumReader)
  private var record: GenericRecord = _

  override def next(): Boolean = {
    if (reader.hasNext) { record = reader.next(record); true }
    else false
  }

  private def fromAvro(dt: DataType, v: Any): Any =
    if (v == null) null
    else dt match {
      case StringType => UTF8String.fromString(v.toString)
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
        arr
      case d: DecimalType =>
        // bytes → big-endian unscaled BigInteger → Spark Decimal
        // at the schema's scale (the writer's exact value back)
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
        org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(new java.math.BigInteger(arr),
            d.scale), d.precision, d.scale)
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        val vals = new Array[Any](st.length)
        var i = 0
        while (i < st.length) {
          vals(i) = fromAvro(st.fields(i).dataType, rec.get(i))
          i += 1
        }
        new GenericInternalRow(vals)
      case ArrayType(elem, _) =>
        val c = v.asInstanceOf[java.util.Collection[Any]]
        val out = new Array[Any](c.size())
        val it = c.iterator()
        var i = 0
        while (it.hasNext) { out(i) = fromAvro(elem, it.next()); i += 1 }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      case MapType(StringType, value, _) =>
        val m = v.asInstanceOf[java.util.Map[Any, Any]]
        val keys = new Array[Any](m.size())
        val vals = new Array[Any](m.size())
        val it = m.entrySet().iterator()
        var i = 0
        while (it.hasNext) {
          val e = it.next()
          keys(i) = UTF8String.fromString(e.getKey.toString)
          vals(i) = fromAvro(value, e.getValue)
          i += 1
        }
        new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(vals))
      case _ => v // boolean/int/long/float/double/ts-micros/date
    }

  override def get(): InternalRow = {
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      vals(i) = fromAvro(required.fields(i).dataType, record.get(i))
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = reader.close()
}
