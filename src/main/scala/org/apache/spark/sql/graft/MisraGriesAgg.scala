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
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters (the 1982 deterministic frequent-items
  * summary, SpaceSaving's ancestor) as ONE bounded-memory aggregate
  * buffer: at most `capacity` (item → counter) entries ever exist per
  * partial buffer, so a heavy-hitter pass over 100 TB of tokens/URLs/
  * domains shuffles ≤ capacity rows per map task instead of the full
  * per-key count table — the sketch sibling of `collect_top_k` (which
  * bounds the heap AFTER an exact per-key aggregate; this bounds the
  * state DURING the single pass, no per-key aggregate at all).
  *
  * update: present → increment; room → insert at 1; full → decrement
  * every counter, dropping zeros (the classic MG step). merge follows
  * Agarwal et al. 2013 ("Mergeable Summaries"): sum counters, then
  * subtract the (capacity+1)-th largest value from all and keep the
  * positives — the summary stays a valid MG sketch under any merge
  * tree.
  *
  * GUARANTEES (hold under ANY partitioning / merge order — pinned by
  * SimilarityAggSpec): every reported estimate is an UNDERESTIMATE
  * within n/(capacity+1) of the true count, and any item with true
  * count > n/(capacity+1) is present in the summary. The reported SET
  * below the guarantee threshold may differ between runs with
  * different splits — callers needing cross-engine determinism size
  * `capacity` ≥ the distinct-item count (then no eviction ever fires
  * and the summary IS the exact count table; q200's contract, the
  * q80/q157 exact-regime convention).
  *
  * eval: array<struct<item string, est long>> sorted (est DESC, item
  * ASC) — a total order, so the exact regime is hash-comparable.
  */
case class MisraGriesAgg(child: Expression, capacity: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(capacity > 0, "MisraGriesAgg capacity must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1L
        case None if buf.size < capacity => buf(s) = 1L
        case None =>
          // full and unseen: decrement every counter, drop zeros —
          // O(capacity) only on evicting rows
          val dead = List.newBuilder[String]
          buf.mapValuesInPlace { (_, c) => c - 1L }
          buf.foreach { case (k, c) => if (c <= 0L) dead += k }
          dead.result().foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buf.updateWith(k) {
        case Some(x) => Some(x + c)
        case None => Some(c)
      }
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest counter from all; ≥ 1
      // entries survive because counters are distinct-or-equal longs
      val cut = buf.values.toArray.sortInPlace()(Ordering[Long].reverse)
        .apply(capacity)
      val dead = List.newBuilder[String]
      buf.mapValuesInPlace { (_, c) => c - cut }
      buf.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.result().foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortInPlace()(
      Ordering.by[(String, Long), (Long, String)] {
        case (item, est) => (-est, item)
      })
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf(new String(kb, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
