package graft.sources

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distributed Avro container-file WRITER (the pair of
  * [[AvroSource]]): one container file per upstream partition, written
  * by the executors — no driver collect, no repartition; the layout
  * mirrors what `df.write.parquet` does. Works over
  * `queryExecution.toRdd` (InternalRow), so values are already in
  * Spark's internal representation — timestamps ARE micros longs,
  * which is exactly Avro's timestamp-micros logical type; strings are
  * UTF8String, converted once at the boundary.
  *
  * Local-filesystem paths (the harness environment); a cluster
  * deployment swaps the java.nio sink for the Hadoop FileSystem API —
  * the per-partition write shape is unchanged. */
object AvroIO {

  def write(df: DataFrame, path: String): Unit = {
    val struct = df.schema
    val schemaJson = AvroSchemas.toAvro(struct, "graft_record").toString
    val dir = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.list(dir)
      .forEach(java.nio.file.Files.deleteIfExists(_))
    val fields = struct.fields
    df.queryExecution.toRdd.foreachPartition { rows =>
      if (rows.hasNext) {
        val avroSchema =
          new org.apache.avro.Schema.Parser().parse(schemaJson)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        val pid = TaskContext.getPartitionId()
        writer.create(avroSchema,
          new java.io.File(f"$path/part-$pid%05d.avro"))
        try {
          rows.foreach { row =>
            val rec = new GenericData.Record(avroSchema)
            var i = 0
            while (i < fields.length) {
              if (!row.isNullAt(i)) {
                rec.put(i, fields(i).dataType match {
                  case BooleanType => row.getBoolean(i)
                  case IntegerType => row.getInt(i)
                  case LongType => row.getLong(i)
                  case FloatType => row.getFloat(i)
                  case DoubleType => row.getDouble(i)
                  case StringType =>
                    row.get(i, StringType)
                      .asInstanceOf[UTF8String].toString
                  case BinaryType =>
                    java.nio.ByteBuffer.wrap(row.getBinary(i))
                  case TimestampType => row.getLong(i) // internal micros
                  case DateType => row.getInt(i) // internal epoch days
                  case d: DecimalType =>
                    // Avro decimal logical: big-endian two's-complement
                    // unscaled value at the schema's scale
                    java.nio.ByteBuffer.wrap(
                      row.getDecimal(i, d.precision, d.scale)
                        .toJavaBigDecimal.unscaledValue().toByteArray)
                  case other => throw new IllegalArgumentException(
                    s"graft-avro does not map ${other.simpleString}")
                })
              }
              i += 1
            }
            writer.append(rec)
          }
        } finally writer.close()
      }
    }
  }
}
