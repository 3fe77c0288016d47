package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** All-k MinHash in ONE aggregate buffer: for each input token hash x,
  * update k universal-hash minima h_i = (a_i·x + b_i) mod p in a single
  * tight loop.
  *
  * The composable alternative — k separate `min((x·a_i + b_i) % p)`
  * aggregates — allocates k hash-aggregate buffer slots and evaluates k
  * independent expression trees per row; at k = 128 over millions of
  * exploded token rows the buffer-update overhead dominates the query
  * (SURVEY §7's custom-Catalyst preference order: a native aggregate
  * beats a 128-wide expression list). Same hash family, same
  * coefficients, same results — bit-for-bit interchangeable with
  * [[graft.ops.DedupOps.minhashSignatureFast]] and the generated DuckDB
  * oracle.
  *
  * Buffer: Array[Long](k), initialized to p (above any h value).
  * Output: ArrayType(LongType) of the k minima.
  */
case class MinHashAgg(child: Expression, k: Int, seed: Long,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  private val p: Long = 2147483647L
  // same generator as DedupOps.minhashCoeffs (duplicated here to keep
  // the sql-package expression free of a graft-package dependency;
  // bit-for-bit equality is pinned by DedupTextSpec's
  // "MinHashAgg array signature is bit-for-bit the column-form" test)
  private lazy val coeffs: (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      a(i) = 1L + rnd.nextInt((1 << 30) - 1).toLong
      b(i) = rnd.nextInt(Int.MaxValue).toLong
      i += 1
    }
    (a, b)
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(p)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // mask to the documented [0, 2^32) domain: a negative input (e.g.
      // xxhash64 fed directly instead of the md5-derived 32-bit x) would
      // otherwise make (a·x+b)%p negative or overflow Long silently,
      // corrupting the signature with no error
      val x = v.asInstanceOf[Long] & 0xFFFFFFFFL
      val (a, b) = coeffs
      var i = 0
      while (i < k) {
        val h = (a(i) * x + b(i)) % p
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}
