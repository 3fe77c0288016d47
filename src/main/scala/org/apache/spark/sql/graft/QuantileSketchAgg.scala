package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic mergeable QUANTILE SKETCH (the Munro–Paterson /
  * Manku–Rajagopalan–Lindsay multi-level summary — KLL's deterministic
  * ancestor) as ONE bounded-memory aggregate buffer: the quantile
  * member of the sketch family next to [[MisraGriesAgg]] (frequency)
  * and HLL/CMS (the q80/q157 contracts).
  *
  * Buffer = per-level sorted-on-demand runs; items at level ℓ carry
  * weight 2^ℓ. update appends at level 0; any level reaching
  * `capacity` COMPACTS: sort ascending, promote the odd-index items
  * to the next level, and (odd run length) retain the largest at the
  * level so TOTAL WEIGHT IS CONSERVED EXACTLY — rank estimates never
  * drift from weight loss, only from compaction shifts. merge
  * concatenates per-level runs then compacts the same way — a valid
  * summary under any merge tree.
  *
  * GUARANTEES (pinned by QuantileSketchSpec): weight mass == n
  * always; per-level run length < 2·capacity; a compaction at level ℓ
  * shifts any rank by ≤ 2^ℓ, so the worst-case rank error is
  * Σ_ℓ C_ℓ·2^ℓ ≤ #levels · n/capacity (C_ℓ ≈ n/(capacity·2^ℓ)
  * compactions happen at level ℓ) — the classic ε ≈ log(n/k)/k
  * deterministic bound. The buffer never exceeds
  * ~2·capacity·#levels longs = O(k·log(n/k)) — at 100 TB a
  * quantile pass shuffles KB-sized buffers per map task instead of a
  * per-value count table or a global sort.
  *
  * DETERMINISM: capacity ≥ n ⇒ no compaction ever fires and eval is
  * the exact sorted value/count table — hash-comparable across
  * engines (the exact-regime convention of q200). Below that, the
  * summary depends on partitioning (like every mergeable sketch);
  * callers get the error bound, not bit-equality.
  *
  * eval: array<struct<value long, weight long>> sorted by value with
  * equal values merged — a canonical form, so the exact regime is
  * oracle-comparable.
  */
case class QuantileSketchAgg(child: Expression, capacity: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.Map[Int, mutable.ArrayBuffer[Long]]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(capacity >= 2 && capacity % 2 == 0,
    "QuantileSketchAgg capacity must be an even number >= 2")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("value", LongType, nullable = false),
      StructField("weight", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  type Buf = mutable.Map[Int, mutable.ArrayBuffer[Long]]

  override def createAggregationBuffer(): Buf = mutable.Map.empty

  /** Compact every level at/above capacity, cascading upward. */
  private def compact(buf: Buf): Unit = {
    var level = 0
    var maxLevel = if (buf.isEmpty) -1 else buf.keys.max
    while (level <= maxLevel) {
      val run = buf.getOrElse(level, null)
      if (run != null && run.size >= capacity) {
        run.sortInPlace()
        val m = run.size
        val even = m - (m % 2) // compact pairs; odd tail stays
        val up = buf.getOrElseUpdate(level + 1,
          mutable.ArrayBuffer.empty[Long])
        var i = 1
        while (i < even) { up += run(i); i += 2 }
        val keep =
          if (m % 2 == 1) mutable.ArrayBuffer(run(m - 1))
          else mutable.ArrayBuffer.empty[Long]
        buf(level) = keep
        if (level + 1 > maxLevel) maxLevel = level + 1
      }
      level += 1
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.getOrElseUpdate(0, mutable.ArrayBuffer.empty[Long]) +=
        v.asInstanceOf[Long]
      compact(buf)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach { case (level, run) =>
      buf.getOrElseUpdate(level, mutable.ArrayBuffer.empty[Long]) ++= run
    }
    compact(buf)
    buf
  }

  override def eval(buf: Buf): Any = {
    val pairs = mutable.LongMap.empty[Long] // value -> total weight
    buf.foreach { case (level, run) =>
      val w = 1L << level
      run.foreach { v => pairs(v) = pairs.getOrElse(v, 0L) + w }
    }
    val sorted = pairs.toArray.sortInPlace()(Ordering.by(_._1))
    new GenericArrayData(sorted.map { case (value, weight) =>
      InternalRow(value, weight)
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (level, run) =>
      out.writeInt(level); out.writeInt(run.size)
      run.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val nLevels = in.readInt()
    val buf: Buf = mutable.Map.empty
    var i = 0
    while (i < nLevels) {
      val level = in.readInt()
      val size = in.readInt()
      val run = new mutable.ArrayBuffer[Long](size)
      var j = 0
      while (j < size) { run += in.readLong(); j += 1 }
      buf(level) = run
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}
