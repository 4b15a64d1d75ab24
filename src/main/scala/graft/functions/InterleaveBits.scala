// Same packaging rationale as CosineSimilarity.scala: external Catalyst
// expressions live under org.apache.spark.sql to reach private[sql]
// analysis helpers; the public surface is graft.functions.GraftFunctions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Native Catalyst expression: Morton/Z-order bit interleave of two 16-bit
  * grid cells into one z-value — the clustering key behind
  * `IngestOps.writeZOrdered`.
  *
  * The SQL spelling is 32 chained shift/mask terms; that expression tree
  * is correct and codegen'd, but it materializes a deep Add chain in every
  * generated stage and re-parses per call site. The native form is the
  * classic O(log n) magic-number spread — 8 shift/mask ops total — in one
  * fused codegen block. Same bit-for-bit result; both spellings are kept
  * (SQL in tests as the cross-check oracle, native on the write path).
  *
  * Inputs are LONG cell indices; only the low 16 bits participate (the
  * z-value fits in 32 bits), matching the 65536-cell normalization the
  * writer applies. Deterministic, null-intolerant, fully codegen'd.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val helper = InterleaveBits.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.interleave($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Spread the low 16 bits of x to even bit positions (Morton spread,
    * O(log n) magic masks), then OR the odd-spread of y.
    */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      InterleaveBits(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
