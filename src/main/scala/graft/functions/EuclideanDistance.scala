// Same packaging rationale as CosineSimilarity.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Native Catalyst expression: Euclidean (L2) distance between two vectors
  * in one fused codegen'd loop — the PQ-encode hot path.
  *
  * Why it exists (measured, SCALE.md r8 ANN table): PQ assignment scores
  * every (vector-slice, codeword) pair — corpus × m × kCodes distance
  * evaluations — and the `sqrt(aggregate(zip_with(...)))` SQL spelling
  * runs those as interpreted per-element lambda dispatch, three passes per
  * pair. On the ×10 embeddings stress corpus that interpretation cost
  * alone took `cosine_topk_pq` from 1.2 s to 27 s. Identical semantics to
  * the fold — left-to-right double accumulation over widened elements,
  * sqrt once at the end — so round-6 quantized assignments (and therefore
  * every oracle hash) are unchanged.
  *
  * EXACT fold equivalence extends to the degenerate cases, which is what
  * makes the `RewriteL2Distance` optimizer rule a safe substitution:
  * `zip_with` null-pads mismatched lengths and a null operand poisons the
  * sum, so the SQL spelling yields NULL for length mismatch or any null
  * element — this kernel does the same (null out, never a partial
  * answer).
  */
case class EuclideanDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_dist"

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = isFloatArray(left)
    val yf = isFloatArray(right)
    if (x.numElements() != y.numElements()) return null // zip_with null-pad
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // null poisons the fold
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val gx = if (isFloatArray(left)) "getFloat" else "getDouble"
      val gy = if (isFloatArray(right)) "getFloat" else "getDouble"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = (double) $a.$gx($i) - (double) $b.$gy($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = Math.sqrt($acc); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object EuclideanDistance {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      EuclideanDistance(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
