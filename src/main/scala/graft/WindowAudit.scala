package graft

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

/** Window-shape auditor over every registered query's PHYSICAL plan
  * (built at sf0.001, never executed). Two offender shapes:
  *
  *  1. `[global-window]` — WindowExec with an EMPTY partition spec: the
  *     whole frame serializes through one reducer (the constant-key idiom
  *     exists to avoid this).
  *  2. `[bounded-key-window]` (r15 verdict task 2) — WindowExec whose
  *     partition key originates ONLY from the broadcast (build) side of a
  *     broadcast join below it, while the probe side reaches the window
  *     with no candidate-pruning join of its own. A bounded-cardinality
  *     key (e.g. 10 query ids) partitioning an unpruned corpus scan means
  *     each window partition holds O(corpus) rows — per-query corpus-sized
  *     sorts that the empty-spec check is blind to. Probe-side joins
  *     (IVF probe lists, graph shortlists, LSH buckets) prune candidates
  *     before the window, so those tiers do not flag. A plan whose
  *     rank-limit filter Spark rewrote into a WindowGroupLimitExec pair
  *     (partial below the exchange, final above) is reported with a
  *     `grouplimit=partial` tag: the partial operator already bounds each
  *     map task's contribution to k rows per key, so the shape is
  *     mitigated at runtime — but the audit still reports it, because the
  *     mitigation is an optimizer rewrite conditioned on the filter
  *     staying adjacent to the window, not a property of the query.
  *
  * Documented audit-arm queries — brute-force ground-truth scoring passes
  * whose cost IS the point (recall gates, drift audits, policy audits) —
  * are allowlisted for shape 2 and reported as `[audit-arm-window]`
  * without counting toward the offender total.
  */
object WindowAudit {
  /** Queries allowed to keep a bounded-key window over an unpruned
    * stream, each with the documented reason. Every entry is either a
    * ground-truth/policy AUDIT arm (the full ranking IS the measured
    * quantity) or a sampling operator whose output is a corpus fraction
    * (no bounded-buffer formulation exists). Production serving tiers
    * are deliberately NOT here — they must plan the topKSelect
    * aggregation or a candidate-pruning join.
    */
  private val auditArmAllowlist: Map[String, String] = Map(
    "filtered_ann_policy" ->
      "policy audit: the post-filter pitfall being measured IS the full-corpus shortlist window",
    "diversity_sample" ->
      "per-cluster proportional quota (output = pct of corpus): selection is a rank over cluster-sized partitions by design; partition count = nCentroids, scaled with n in deployment")

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate("graft-window-audit")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      System.err.println(s"[window-audit-q] $name")
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan
        def children(p: SparkPlan): Seq[SparkPlan] = p match {
          // AQE wraps the whole query as a leaf; audit its input plan
          case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
          case other => other.children
        }
        def subtree(p: SparkPlan): Seq[SparkPlan] =
          p +: children(p).flatMap(subtree)
        // does the window's child reach (without crossing a compacting
        // aggregate) a broadcast NESTED LOOP join whose BUILD side
        // supplies every partition attribute while its PROBE side runs
        // join-free into the window? Each piece is load-bearing:
        //  - NESTED LOOP: an equi-keyed BroadcastHashJoin prunes/limits
        //    probe rows by key match (a shortlist join-back, an LSH
        //    bucket join, a label equi-probe), but an NLJ against a
        //    bounded broadcast side passes EVERY corpus row into the
        //    per-key window — the hammingShortlist-class shape;
        //  - compacting aggregate: an aggregate whose grouping keys are a
        //    subset of the window's partition attrs bounds the stream to
        //    the key cardinality before the window (the topKSelect
        //    shape), so anything below it no longer feeds the window
        //    corpus-sized runs. An aggregate grouped by OTHER keys (e.g.
        //    per-vec_id assignment argmin) does not compact the per-key
        //    stream and the walk continues through it.
        def boundedKeyOverUnpruned(w: WindowExec): Boolean = {
          val partAttrs = AttributeSet(
            w.partitionSpec.flatMap(_.references.toSeq))
          if (partAttrs.isEmpty) return false
          def compacting(p: SparkPlan): Boolean = p match {
            case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
              a.groupingExpressions.nonEmpty &&
                AttributeSet(a.groupingExpressions.map(_.toAttribute))
                  .subsetOf(partAttrs)
            case _ => false
          }
          def search(p: SparkPlan): Boolean =
            if (compacting(p)) false
            else p match {
              case j: BroadcastNestedLoopJoinExec =>
                val (build, probe) = j.buildSide match {
                  case BuildLeft => (j.left, j.right)
                  case BuildRight => (j.right, j.left)
                }
                (partAttrs.subsetOf(build.outputSet) &&
                  !subtree(probe).exists {
                    case _: BaseJoinExec | _: CartesianProductExec => true
                    case _ => false
                  }) || children(j).exists(search)
              case other => children(other).exists(search)
            }
          search(w.child)
        }
        def hasPartialGroupLimit(w: WindowExec): Boolean =
          subtree(w.child).exists {
            case _: WindowGroupLimitExec => true
            case _ => false
          }
        def walk(p: SparkPlan): Unit = {
          p match {
            case w: WindowExec if w.partitionSpec.isEmpty =>
              bad += 1
              println(s"[global-window] $name :: ${w.windowExpression.mkString(";").take(120)}")
            case w: WindowExec if boundedKeyOverUnpruned(w) =>
              val tag = if (hasPartialGroupLimit(w)) " grouplimit=partial" else ""
              if (auditArmAllowlist.contains(name))
                println(s"[audit-arm-window] $name$tag :: ${w.windowExpression.mkString(";").take(120)}")
              else {
                bad += 1
                println(s"[bounded-key-window] $name$tag :: ${w.windowExpression.mkString(";").take(120)}")
              }
            case _ =>
          }
          children(p).foreach(walk)
          p.subqueries.foreach(walk)
        }
        walk(plan)
      } catch {
        case e: Throwable => println(s"[plan-error] $name: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    println(s"[summary] offenders=$bad")
    spark.stop()
  }
}
