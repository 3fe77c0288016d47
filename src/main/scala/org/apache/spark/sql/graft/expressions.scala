package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY.md §7 "custom Catalyst surface").
  *
  * `ReplaceInf` is the native form of the reference's Python
  * `replace_infs_udf` (`/root/reference/src/modelling.py:61-68`): the UDF
  * costs a JVM→Python→JVM round trip per batch and breaks whole-stage
  * codegen; this expression generates straight-line Java inside the
  * surrounding stage.
  *
  * `CosineSim` computes cosine similarity over two double arrays in one
  * fused loop — the composed `aggregate(zip_with(...))` form allocates an
  * intermediate array per row and evaluates lambda expressions per
  * element; on a 100 TB ANN scan the fused loop is the difference between
  * memory-bandwidth-bound and allocation-bound.
  */
case class ReplaceInf(child: Expression, replacement: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // ImplicitCastInputTypes (not just ExpectsInputTypes) so SQL-surface
  // literals — e.g. DECIMAL(2,1) from `replace_inf(x, -9.0)` — coerce
  // to double instead of failing analysis
  override def left: Expression = child
  override def right: Expression = replacement
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType)

  // null → null (the reference UDF's `if x` falsiness keeps nulls); the
  // replacement value is only consulted when the input is ±∞ — so a null
  // replacement yields null only for infinite inputs, and finite inputs
  // pass through regardless. Interpreted eval and codegen below implement
  // exactly that contract (the replacement child is NOT null-checked
  // up-front, which a naive nullSafeCodeGen would do).
  override def nullable: Boolean = child.nullable || replacement.nullable
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val d = v.asInstanceOf[Double]
      if (d.isInfinite) replacement.eval(input) else d
    }
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val replGen = replacement.genCode(ctx)
    val code =
      code"""
        |${childGen.code}
        |boolean ${ev.isNull} = true;
        |double ${ev.value} = 0.0;
        |if (!${childGen.isNull}) {
        |  if (Double.isInfinite(${childGen.value})) {
        |    ${replGen.code}
        |    ${ev.isNull} = ${replGen.isNull};
        |    ${ev.value} = ${ev.isNull} ? 0.0 : ${replGen.value};
        |  } else {
        |    ${ev.isNull} = false;
        |    ${ev.value} = ${childGen.value};
        |  }
        |}
      """.stripMargin
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ReplaceInf =
    copy(child = newLeft, replacement = newRight)
}

/** Fused cosine similarity over two ArrayType(DoubleType) columns. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val den = ctx.freshName("den")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.getDouble($i);
         |  double y = $b.getDouble($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |double $den = Math.sqrt($na) * Math.sqrt($nb);
         |if ($den == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / $den; }
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Jaro-Winkler similarity kernel, shared by the interpreted and the
  * codegen path of [[JaroWinkler]] (the same static-helper shape Spark's
  * own `Levenshtein` uses: the generated code is a single static call,
  * so the expression stays inside whole-stage codegen without inlining
  * a 40-line loop nest into every stage).
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` (verified
  * against it vector-by-vector, see ExpressionsSpec): match window
  * `max(|a|,|b|)/2 - 1` (floor, min 0), transpositions halved with
  * integer division, Winkler prefix boost (factor 0.1, prefix capped at
  * 4) applied only when jaro > 0.7, and — DuckDB's corner — EMPTY vs
  * EMPTY returns 0.0, not 1.0. Operates on UTF-8 bytes (byte-equal to
  * codepoint matching on the ASCII fixture domain; multi-byte
  * codepoints match per byte, which is also how DuckDB's byte-oriented
  * kernel behaves).
  *
  * Cost: O(|a|·window) time, two small boolean scratch arrays per call
  * — for entity-resolution workloads this runs AFTER blocking, so the
  * quadratic term is bounded by the name length, never the table. */
object JaroWinklerAlgo {
  def similarity(l: UTF8String, r: UTF8String): Double = {
    val a = l.getBytes; val b = r.getBytes
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la); val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb, i + window + 1)
      var j = math.max(0, i - window)
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0; i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro > 0.7) {
      val lim = math.min(4, math.min(la, lb))
      var p = 0
      while (p < lim && a(p) == b(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** DuckDB-parity Jaro-Winkler similarity between two strings — the
  * scoring half of the record-linkage surface (the candidate-generation
  * half is the blocked join in SparkEntry q174 / DedupOps). Null-safe:
  * either side null → null. */
/** The iterative Hilbert xy→d walk (Hilbert 1891; Butz 1971 gave the
  * first algorithm) shared by the interpreted and generated paths of
  * [[HilbertIndex]] — the [[JaroWinklerAlgo]] static-call pattern.
  * Inputs beyond `bits` bits are masked (the caller's domain bound,
  * the spreadBits rule). */
object HilbertAlgo {
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Hilbert curve index of two `bits`-bit dimensions as ONE codegen'd
  * static call — the layout key of q362/q364. The composed
  * `aggregate`-fold spelling evaluates an interpreted lambda per bit
  * level per row (measured ~3× the z-curve's fused spread); this stays
  * inside whole-stage codegen like [[JaroWinkler]]. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, LongType)

  override def nullSafeEval(l: Any, r: Any): Any =
    HilbertAlgo.xy2d(bits, l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.HilbertAlgo.xy2d($bits, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerAlgo.similarity(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.JaroWinklerAlgo.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
