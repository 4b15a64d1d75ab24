// Declared inside org.apache.spark.sql to reach private[sql] analysis types
// (AbstractDataType, ExpressionUtils) — the standard packaging for external
// Catalyst expressions; the public API surface is graft.functions.GraftFunctions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Native Catalyst expression: cosine similarity between two float vectors
  * in a single fused pass (dot product and both norms together), with
  * whole-stage codegen.
  *
  * This is the one place in the engine where the built-ins genuinely can't
  * express the computation efficiently (SURVEY.md §7.2): the equivalent
  * `aggregate(zip_with(...))` formulation is three separate *interpreted*
  * higher-order folds — per-element lambda dispatch, three passes over the
  * arrays, no codegen. On the ANN hot path (corpus × queries score matrix)
  * that interpretation cost dominates. Here the loop compiles into the
  * generated Java of the enclosing stage.
  *
  * Semantics match the fold formulation bit-for-bit: left-to-right double
  * accumulation over float→double-widened elements, so results stay
  * deterministic and DuckDB-oracle-comparable. Zero-norm input → NULL
  * (mirrors the NULLIF divide guard, SURVEY.md §2.7 F3).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // float and double vectors both accepted, independently per side — raw
  // corpus embeddings are float32 parquet, while derived vectors (e.g.
  // Lloyd-trained IVF centroids, which are per-dimension means) are
  // double. Accumulation is always double, so a float input widens
  // exactly and results are identical to casting up front.
  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = isFloatArray(left)
    val yf = isFloatArray(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val gx = if (isFloatArray(left)) "getFloat" else "getDouble"
      val gy = if (isFloatArray(right)) "getFloat" else "getDouble"
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xi = (double) $a.$gx($i);
         |  double yi = (double) $b.$gy($i);
         |  $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point (no function-registry dependency). */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

