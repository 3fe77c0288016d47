package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

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
