// Same packaging rationale as CosineSimilarity.scala: external Catalyst
// expressions live under org.apache.spark.sql to reach private[sql]
// analysis helpers; the public surface is graft.functions.GraftFunctions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Native Catalyst expression: Hilbert-curve index of a 16-bit × 16-bit
  * grid cell — the locality-tighter sibling of [[InterleaveBits]].
  *
  * The classic xy2d walk (Wikipedia's canonical form): 16 levels, each
  * reading one bit of x and y, accumulating s²·((3·rx) XOR ry) and
  * rotating/reflecting the frame. Reflection uses the full-grid constant
  * 65535 − v = ~v on 16 bits, so high bits scrambled by earlier levels
  * never contaminate the bits later levels read (no borrows in a bitwise
  * complement) — which is also what makes the unrolled SQL oracle replay
  * bit-identical.
  *
  * Why it exists next to Morton: both interleave the key space, but the
  * Hilbert walk never makes the long diagonal jumps Z-order takes between
  * quadrant boundaries. Measured consequence (`curve_span_compare`,
  * writer spec): at equal-COUNT ranges — file writes — Hilbert's
  * per-file boxes touch fewer slice queries and never exceed Morton's
  * box area; at equal-curve-range cuts the curves near-tie, trading
  * Morton's axis-aligned slabs (one thin dimension) for Hilbert's
  * balanced boxes. Deterministic, null-intolerant, fully codegen'd.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val helper = HilbertIndex.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.xy2d($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Order-16 Hilbert xy2d: d in [0, 2³²) for cells in [0, 65536)². */
  def xy2d(a: Long, b: Long): Long = {
    var x = a & 0xffffL
    var y = b & 0xffffL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = 0xffffL - x; y = 0xffffL - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      HilbertIndex(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
