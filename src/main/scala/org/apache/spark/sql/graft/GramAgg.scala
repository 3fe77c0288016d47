package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact GRAM MATRIX (Xᵀ X) in ONE aggregate buffer: per input vector,
  * every upper-triangle product x_i·x_j is fixed to integer micro-units
  * and added into a d(d+1)/2-long buffer in a single tight loop.
  *
  * The composable alternative — explode d(d+1)/2 (i, j, p) structs per
  * row and hash-aggregate on (i, j) — inflates the row count 2080×
  * (d = 64) before the shuffle ever starts; at corpus scale the struct
  * allocation and exchange dominate (measured 7.1 s → 1 s class at
  * sf0.1). Same SURVEY §7 preference order that produced
  * [[MinHashAgg]]: a native buffer aggregate beats a wide explode.
  *
  * Rounding matches Spark's own `round(x, 0)` (and DuckDB's `round`):
  * decimal HALF_UP, i.e. ties away from zero over the SHORTEST-DECIMAL
  * rendering of the double. The hot path uses floor/ceil arithmetic
  * and falls back to BigDecimal only within 1e-6 of a .5 boundary, so
  * the exact-tie semantics cost nothing on real data.
  *
  * Output: array<struct<i int, j int, g_micro long>> in row-major
  * upper-triangle order — explode + project to the relational form.
  */
case class GramAgg(child: Expression, dim: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(dim > 0, "GramAgg dim must be positive")
  private val cells = dim * (dim + 1) / 2

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("g_micro", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](cells)

  private def roundMicro(v: Double): Long = {
    val r = if (v >= 0) Math.floor(v + 0.5) else Math.ceil(v - 0.5)
    // near a .5 boundary the float add can cross where the decimal
    // rendering would not — delegate those to the exact decimal path
    if (Math.abs(v - (r - 0.5)) < 1e-6 || Math.abs(v - (r + 0.5)) < 1e-6)
      java.math.BigDecimal.valueOf(v)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    else r.toLong
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"GramAgg expects $dim-dim vectors, got ${arr.numElements()}")
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim) { x(i) = arr.getDouble(i); i += 1 }
      var idx = 0
      i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          buf(idx) += roundMicro(x(i) * x(j) * 1e6)
          idx += 1; j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cells) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](cells)
    var idx = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        out(idx) = InternalRow(i, j, buf(idx))
        idx += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(cells * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(cells)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramAgg =
    copy(child = newChild)
}
