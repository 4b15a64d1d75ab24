package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType,
  ShortType}

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
  val KnownBounded: Seq[(String, String)] = {
    // the ANN drift audits' recall-ppm numerators (r17): h_* is a sum of
    // 0/1 hit flags over the brute ground-truth rows, ≤ k·nQueries = 50
    // at the fixed audit knobs (SF-independent — the knobs, not the
    // corpus, bound the row count), so h·1e6 ≤ 5e7 << 2^63. These
    // expressions predate r17; the audit only sees them now because the
    // per-factor result rows became lazy (no checkpoint leaf hides them).
    val driftRecallWhy = "drift-audit recall numerator: sum of hit flags over " +
      "brute top-k rows, <= k*nQueries = 50 at the fixed audit knobs; *1e6 <= 5e7"
    Seq(
      ("sum(CASE WHEN (ma = mb) THEN 1 ELSE 0 END) * 1000000" ->
        "MinHash signature agreement: sum over exactly 16 hash_idx rows per pair, bound 16e6 << 2^63")) ++
      Seq("h_stale", "h_fresh", "h_tomb", "h_hard", "h_rep", "h_plain", "h_resc")
        .map(h => s"($h * 1000000L)" -> driftRecallWhy)
  }

  private val ScaleLits: Set[Long] = Set(100L, 10000L, 100000L, 1000000L, 1000000000L)

  /** DECIMAL companion detector (r13 verdict task 5): Spark with ANSI off
    * silently NULLs a decimal whose value exceeds its type — and any
    * decimal op whose IDEAL precision exceeds 38 gets CAPPED at 38, so
    * the type no longer covers the operands' worst case. The LONG
    * detector can't see this class; now that the registry is
    * DECIMAL(38,0)-widened everywhere, this is the remaining
    * silent-corruption surface.
    *
    * Detector: a worst-case INTEGRAL-DIGIT bound propagated through the
    * optimized plan (alias lineage fixpoint, like the LONG detector's
    * aggAttrs). Model leaf bounds, documented as the audit's scale
    * assumptions: a raw LONG/INT scan column holds ≤ 10^13 (micros /
    * cents / ppm-scaled row values), one aggregation multiplies row
    * count ≤ 10^15 into a Sum (so a single corpus Sum of row values is
    * ≤ 10^28) and a Count is ≤ 10^15. A decimal expression whose digit
    * bound exceeds its declared (precision − scale) capacity can
    * silently NULL under the model → offender. Ops BELOW the 38 cap can
    * never fire (Spark's ideal result type covers the operands'
    * type-level worst case, and the model bound is never wider); the
    * detector therefore fires exactly on capped arithmetic whose
    * headroom the model exhausts — stacked scale multiplies,
    * aggregate × aggregate products, Sum-of-products chains.
    */
  val RowValueDigits = 9 // raw scan-column numeric ≤ 10^9 (prices, counts,
  // quantities, ppm shares); DERIVED cents/micros/ppm columns pick up their
  // scale factor's digits through literal propagation (x * 1e6 → +7), so
  // the model still prices the scaled idioms correctly
  val RowCountDigits = 15 // rows or groups per aggregate ≤ 10^15 (100 TB class)

  /** (query-name regex, bound-justification) for decimal sites whose REAL
    * bound is provably below the model's worst case — the model cannot see
    * (a) calendar/window-bounded group sizes, (b) value domains tighter
    * than 10^RowValueDigits (ppm shares, discount micros, rank sums), or
    * (c) producer bounds lost across ShardedOrder/localCheckpoint leaf
    * boundaries (the attr re-enters the plan as a bare DECIMAL(38,0)).
    * An entry is an audited claim with its arithmetic spelled out; any
    * NEW query tripping the detector must widen, restructure, or land
    * here with a proven bound.
    */
  val KnownBoundedDecimal: Seq[(String, String)] = Seq(
    ("moments_profile|interarrival_profile" ->
      "central-moment integer polynomials n^k*mk: ENFORCED (r15) — momentsProfile raise_errors inside the moment columns when max|x| > 3e4 or n*max|x| > 1.5e9 (14*(n*max|x|)^4 <= 7.1e37 < 10^38 covers every intermediate term), so ANSI-off decimal NULLing cannot silently corrupt a large group; corpus-scale groups must pre-aggregate"),
    ("revenue_trend|rolling_regression_slope|rolling_corr|ljung_box|revenue_acf|safety_stock|price_index_monthly|stl_strength|seasonal_residual_outliers" ->
      "time-series family over the CALENDAR-DAY aggregate series: n <= 1e4 days, daily sums <= 1e13 cents -> d*d sums <= 1e30, n*sxy <= 1e34 << 1e38"),
    ("simpson_paradox_screen|discount_elasticity|cuped_adjustment|diff_in_diff|welch_t_test|anova_priority_spend|neyman_allocation|gini_spend|mahalanobis_outliers|eb_shrunk_returns" ->
      "micros-share normal equations/variance screens: x,y are bounded domains (discount micros <= 1e6, quantity cents <= 1e6, ppm <= 1e6), so sx,sy <= 1e18 over 1e12 rows; n*sxy <= 1e36 and sx*sy <= 1e36 < 1e38 (the DECIMAL(38,0) design bound in the simpson scaladoc)"),
    ("ks_source_drift.*|ks_reference_drift.*|t_closeness_audit|customer_value_deciles" ->
      "ECDF cross-products of COUNTS: cum and n are both row counts <= 1e12 (dec-38 typing is the ShardedOrder checkpoint boundary, not the value) -> products <= 1e24 << 1e38"),
    ("classifier_auc|mann_whitney_u|clf_keep_parity|er_blocking_audit|bcubed_dedup_eval" ->
      "U-statistic / pair-count ratios: rank sums and pair counts <= n^2 = 1e24; * 1e6 ppm = 1e30 << 1e38; bcubed inner (c*1e6 div n) is a share <= 1e6 (c <= n), outer sum <= 1e6*N <= 1e18"),
    ("abc_xyz_matrix" ->
      "per-part CALENDAR sums behind the shard boundary: sq <= 1e3 months * 1e9 cents = 1e12, sq*sq <= 1e24, sqq*m*4 <= 1e24 (the 20-digit-numerator claim in the scaladoc)"),
    ("graph_modularity|graph_assortativity" ->
      "degree products over edges: deg <= |E| = 1e12, sum over edges of dx*dy <= 1e12 * 1e24 = 1e36 < 1e38"),
    ("embedding_centroid_drift" ->
      "per-dimension micros sums: |component micros| <= 1e6 * 1e12 vecs = 1e18 per dim; sa*sb <= 1e36, summed over the 64-dim grid stays < 1e38 (one fixed-shape division at the end, per the scaladoc)"),
    ("token_burstiness" ->
      "dispersion moments of per-doc term counts: count <= 1e6/doc, s1 <= 1e18 over 1e12 docs, s1^2 <= 1e36 < 1e38"),
    ("mv_incremental" ->
      "algebraic money-sum state: corpus revenue <= 1e14 dollars against the dec(p+10,2) sum type's 1e20+ integral capacity"),
    ("q9_profit_nation" ->
      "TPC-H money chain in dec(18,2) arithmetic: per-row profit <= 1e7, per-(nation,year) sums <= 1e19 against the capped 1e34 integral capacity"))

  private def digitsOf(v: Any): Int = v match {
    case null => 1
    case d: org.apache.spark.sql.types.Decimal =>
      d.toBigDecimal.abs.toBigInt.toString.length
    case b: java.math.BigDecimal => b.abs.toBigInteger.toString.length
    case n: Number => math.abs(n.longValue).toString.length
    case _ => 38
  }

  /** Worst-case integral-digit bound under the model; `known` carries
    * alias-lineage bounds for attributes. Capped at 99 (only the ≤ 38
    * comparisons matter).
    */
  private def digitBound(e: Expression, known: Map[ExprId, Int]): Int = {
    def b(x: Expression): Int = math.min(99, digitBound(x, known))
    e match {
      case Literal(v, _) => digitsOf(v)
      case ar: AttributeReference => known.getOrElse(ar.exprId, ar.dataType match {
        case d: DecimalType => d.precision - d.scale
        case LongType       => RowValueDigits // model: raw scan long
        case IntegerType    => math.min(RowValueDigits, 10)
        case ShortType      => 5
        case ByteType       => 3
        case _              => RowValueDigits
      })
      case c: Cast => c.dataType match {
        case d: DecimalType => math.min(b(c.child), d.precision - d.scale)
        case LongType       => math.min(b(c.child), 19)
        case IntegerType    => math.min(b(c.child), 10)
        case _              => b(c.child)
      }
      case ae: AggregateExpression => ae.aggregateFunction match {
        case s: Sum     => math.min(99, b(s.child) + RowCountDigits)
        case _: Count   => RowCountDigits
        case m: Min     => b(m.child)
        case m: Max     => b(m.child)
        case a: Average => b(a.child)
        case f          => f.dataType match {
          case d: DecimalType => d.precision - d.scale
          case _              => 19
        }
      }
      case w: WindowExpression => b(w.windowFunction)
      case Add(l, r, _)      => math.max(b(l), b(r)) + 1
      case Subtract(l, r, _) => math.max(b(l), b(r)) + 1
      case Multiply(l, r, _) => b(l) + b(r)
      case Divide(l, r, _)   => b(l) + (r.dataType match {
        case d: DecimalType => d.scale // denominator can be as small as 10^-s
        case _              => 0
      }) + 1
      case IntegralDivide(l, _, _) => b(l)
      case Remainder(_, r, _) => b(r)
      case Pmod(_, r, _)      => b(r)
      case u: UnaryMinus      => b(u.child)
      case a: Abs             => b(a.child)
      case r: Round           => b(r.child)
      case r: BRound          => b(r.child)
      case c: Coalesce        => c.children.map(b).max
      case i: If              => math.max(b(i.trueValue), b(i.falseValue))
      case cw: CaseWhen =>
        (cw.branches.map(_._2) ++ cw.elseValue.toSeq).map(b).max
      case g: Greatest => g.children.map(b).max
      case l: Least    => l.children.map(b).max
      case al: Alias   => b(al.child)
      // unknown producer: fall back to the declared type's capacity
      case other =>
        (try other.dataType catch { case _: Throwable => null }) match {
          case d: DecimalType => d.precision - d.scale
          case LongType       => 19
          case IntegerType    => 10
          case _              => RowValueDigits
        }
    }
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate("graft-overflow-audit")
    var offenders = 0
    var allowlisted = 0
    var decOffenders = 0
    var decAllowlisted = 0
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
        // ---- DECIMAL companion pass: digit-bound model vs capacity ----
        // alias-lineage fixpoint: bound every named column by its
        // producing expression, so downstream nodes see 28 for a corpus
        // sum instead of the type-level 38
        var known = Map.empty[ExprId, Int]
        var changed = true
        var iters = 0
        while (changed && iters < 10) {
          changed = false; iters += 1
          plan.foreach { node =>
            node.expressions.foreach(_.foreach {
              case al: Alias =>
                val nb = math.min(99, digitBound(al.child, known))
                if (known.get(al.exprId).forall(_ > nb)) {
                  known += al.exprId -> nb; changed = true
                }
              case _ =>
            })
          }
        }
        val flagged = scala.collection.mutable.Set.empty[String]
        plan.foreach { node =>
          node.expressions.foreach(_.foreach { e =>
            val arithmetic = e match {
              case _: Add | _: Subtract | _: Multiply | _: Divide => true
              case ae: AggregateExpression =>
                ae.aggregateFunction.isInstanceOf[Sum]
              case _ => false
            }
            // WindowSpecDefinition and friends throw on dataType — they are
            // never arithmetic, so a null sentinel skips them
            val dt = try e.dataType catch { case _: Throwable => null }
            dt match {
              case d: DecimalType if arithmetic =>
                val cap = d.precision - d.scale
                val bound = digitBound(e, known)
                if (bound > cap) {
                  val txt = e.sql.take(160)
                  if (flagged.add(txt)) {
                    KnownBoundedDecimal.find { case (pat, _) => name.matches(pat) } match {
                      case Some((_, why)) =>
                        decAllowlisted += 1
                        println(s"[dec-bounded-ok] $name :: $txt :: $why")
                      case None =>
                        decOffenders += 1
                        println(s"[decimal-overflow-risk] $name :: bound=10^$bound cap=10^$cap :: $txt")
                    }
                  }
                }
              case _ =>
            }
          })
        }
      } catch {
        case e: Throwable => println(s"[plan-error] $name: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    println(s"[summary] offenders=$offenders allowlisted=$allowlisted " +
      s"dec_offenders=$decOffenders dec_allowlisted=$decAllowlisted")
    spark.stop()
  }
}
