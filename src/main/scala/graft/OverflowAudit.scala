package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.types.LongType

/** Static LONG-overflow audit over every registered query's OPTIMIZED
  * logical plan (r12 verdict task 6) — the automated version of the sf1
  * smoke that caught `abc_xyz_matrix` and `concentration_8020`: both were
  * hash-green at every tested SF and only overflowed at the next decade,
  * because a LONG-typed `sum(corpus values) * 1000000` ppm idiom has
  * ~9.2e18 of headroom that a 2.5e13-token corpus exhausts.
  *
  * Detector: a `Multiply` whose RESULT type is LongType, one operand a
  * ppm/bps-class scale literal (100 … 1e9), the other operand's attribute
  * lineage reaching a Sum/Count aggregate — i.e. an unwidened
  * aggregate×scale product. The DECIMAL(38,0)-widened idiom disappears
  * from this detector by construction (the multiply re-types to decimal).
  *
  * Sums bounded by a CONSTANT domain (the 16-hash MinHash estimator, the
  * 32-bit SimHash vote fold, per-band agreement counts ≤ NumBands) cannot
  * overflow at any corpus size: bound × 1e6 « 2^63. Those sites are
  * allowlisted EXPLICITLY below with their bound — an allowlisted line is
  * an audited claim, not an exemption; anything new that trips the
  * detector must either widen to DECIMAL(38,0) or land here with a bound.
  *
  * Plans are built at sf0.001 and never executed. Exit summary prints
  * offenders=N; the round-close gate expects 0.
  */
object OverflowAudit {

  /** (pattern, bound-justification). Pattern is matched against the
    * offending multiply's sql text.
    */
  val KnownBounded: Seq[(String, String)] = Seq(
    ("sum(CASE WHEN (ma = mb) THEN 1 ELSE 0 END) * 1000000" ->
      "MinHash signature agreement: sum over exactly 16 hash_idx rows per pair, bound 16e6 << 2^63"))

  private val ScaleLits: Set[Long] = Set(100L, 10000L, 100000L, 1000000L, 1000000000L)

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate("graft-overflow-audit")
    var offenders = 0
    var allowlisted = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      System.err.println(s"[overflow-audit-q] $name")
      try {
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        // attributes produced (anywhere in the plan) by a long-typed
        // Sum/Count aggregate — the corpus-scale candidates
        val aggAttrs = scala.collection.mutable.Set.empty[ExprId]
        plan.foreach {
          case a: Aggregate =>
            a.aggregateExpressions.foreach {
              case al: Alias =>
                val hasLongAgg = al.child.exists {
                  case ae: AggregateExpression => ae.aggregateFunction match {
                    case _: Sum   => ae.dataType == LongType
                    case _: Count => true
                    case _        => false
                  }
                  case _ => false
                }
                if (hasLongAgg) aggAttrs += al.exprId
              case _ =>
            }
          case _ =>
        }
        // propagate through pass-through aliases (projections renaming an
        // aggregate output keep its overflow class)
        var grew = true
        while (grew) {
          grew = false
          plan.foreach { node =>
            node.expressions.foreach(_.foreach {
              case al: Alias if !aggAttrs.contains(al.exprId) =>
                val feeds = al.child.references.exists(r => aggAttrs.contains(r.exprId))
                val direct = al.child match {
                  case ar: AttributeReference => aggAttrs.contains(ar.exprId)
                  case c: Cast => c.child.references.exists(r => aggAttrs.contains(r.exprId)) &&
                    c.dataType == LongType
                  case _ => feeds && al.child.dataType == LongType &&
                    !al.child.exists(_.isInstanceOf[AggregateExpression])
                }
                if (direct) { aggAttrs += al.exprId; grew = true }
              case _ =>
            })
          }
        }
        def isScaleLit(e: Expression): Boolean = e match {
          case Literal(v: Long, LongType) => ScaleLits.contains(v)
          case Literal(v: Int, _)         => ScaleLits.contains(v.toLong)
          case Cast(Literal(v: Long, LongType), _, _, _) => ScaleLits.contains(v)
          case Cast(Literal(v: Int, _), _, _, _) => ScaleLits.contains(v.toLong)
          case _ => false
        }
        def reachesAgg(e: Expression): Boolean = e.exists {
          case ar: AttributeReference => aggAttrs.contains(ar.exprId)
          case ae: AggregateExpression => ae.aggregateFunction match {
            case _: Sum   => ae.dataType == LongType
            case _: Count => true
            case _        => false
          }
          case _ => false
        }
        plan.foreach { node =>
          node.expressions.foreach(_.foreach {
            case m @ Multiply(l, r, _) if m.dataType == LongType &&
                ((isScaleLit(l) && reachesAgg(r)) || (isScaleLit(r) && reachesAgg(l))) =>
              val txt = m.sql.take(160)
              KnownBounded.find { case (pat, _) => txt.contains(pat) } match {
                case Some((_, why)) =>
                  allowlisted += 1
                  println(s"[bounded-ok] $name :: $txt :: $why")
                case None =>
                  offenders += 1
                  println(s"[long-overflow-risk] $name :: $txt")
              }
            case _ =>
          })
        }
      } catch {
        case e: Throwable => println(s"[plan-error] $name: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    println(s"[summary] offenders=$offenders allowlisted=$allowlisted")
    spark.stop()
  }
}
