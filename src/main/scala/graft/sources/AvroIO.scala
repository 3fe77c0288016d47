package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.types._

/** Distributed Avro container-file WRITER (the pair of
  * [[AvroSource]]): one container file per upstream partition, written
  * by the executors — no driver collect, no repartition; the layout
  * mirrors what `df.write.parquet` does. Works over
  * `queryExecution.toRdd` (InternalRow), so values are already in
  * Spark's internal representation — timestamps ARE micros longs,
  * which is exactly Avro's timestamp-micros logical type; strings are
  * UTF8String, converted once at the boundary. Nested structs map to
  * nested Avro records and arrays to Avro arrays, recursively
  * (InternalRow and ArrayData share the SpecializedGetters accessor
  * surface, so one converter walks both).
  *
  * Local-filesystem paths (the harness environment); a cluster
  * deployment swaps the java.nio sink for the Hadoop FileSystem API —
  * the per-partition write shape is unchanged. */
object AvroIO {

  private def unwrapNull(s: Schema): Schema = AvroSchemas.nonNull(s)

  /** One Spark-internal value → its Avro datum, positions `i` of
    * getter `g`; `avro` is the value's (union-unwrapped) schema. */
  private def toAvroValue(dt: DataType, g: SpecializedGetters, i: Int,
                          avro: Schema): Any = dt match {
    case BooleanType => g.getBoolean(i)
    case IntegerType => g.getInt(i)
    case LongType => g.getLong(i)
    case FloatType => g.getFloat(i)
    case DoubleType => g.getDouble(i)
    case StringType => g.getUTF8String(i).toString
    case BinaryType => java.nio.ByteBuffer.wrap(g.getBinary(i))
    case TimestampType => g.getLong(i) // internal micros
    case DateType => g.getInt(i) // internal epoch days
    case d: DecimalType =>
      // Avro decimal logical: big-endian two's-complement unscaled
      // value at the schema's scale
      java.nio.ByteBuffer.wrap(
        g.getDecimal(i, d.precision, d.scale)
          .toJavaBigDecimal.unscaledValue().toByteArray)
    case st: StructType =>
      toRecord(g.getStruct(i, st.length), st, avro)
    case ArrayType(elem, _) =>
      val arr = g.getArray(i)
      val elemSchema = unwrapNull(avro.getElementType)
      val out = new java.util.ArrayList[Any](arr.numElements())
      var j = 0
      while (j < arr.numElements()) {
        out.add(if (arr.isNullAt(j)) null
          else toAvroValue(elem, arr, j, elemSchema))
        j += 1
      }
      out
    case MapType(StringType, value, _) =>
      val m = g.getMap(i)
      val keys = m.keyArray(); val vals = m.valueArray()
      val valueSchema = unwrapNull(avro.getValueType)
      val out = new java.util.HashMap[String, Any](m.numElements())
      var j = 0
      while (j < m.numElements()) {
        out.put(keys.getUTF8String(j).toString,
          if (vals.isNullAt(j)) null
          else toAvroValue(value, vals, j, valueSchema))
        j += 1
      }
      out
    case other => throw new IllegalArgumentException(
      s"graft-avro does not map ${other.simpleString}")
  }

  private def toRecord(row: InternalRow, st: StructType,
                       avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    var i = 0
    while (i < st.length) {
      if (!row.isNullAt(i))
        rec.put(i, toAvroValue(st.fields(i).dataType, row, i,
          unwrapNull(avro.getFields.get(i).schema())))
      i += 1
    }
    rec
  }

  def write(df: DataFrame, path: String): Unit = {
    val struct = df.schema
    val schemaJson = AvroSchemas.toAvro(struct, "graft_record").toString
    val dir = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dir)
    graft.Fs.listDir(dir)(
      _.forEach(java.nio.file.Files.deleteIfExists(_)))
    df.queryExecution.toRdd.foreachPartition { rows =>
      if (rows.hasNext) {
        val avroSchema =
          new org.apache.avro.Schema.Parser().parse(schemaJson)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        val pid = TaskContext.getPartitionId()
        writer.create(avroSchema,
          new java.io.File(f"$path/part-$pid%05d.avro"))
        try rows.foreach(row => writer.append(toRecord(row, struct,
          avroSchema)))
        finally writer.close()
      }
    }
  }
}
