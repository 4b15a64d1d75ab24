package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import org.apache.spark.sql.graft.CosineSimilarity

/** Optimizer rule (SURVEY.md §7.2's custom-Rule tier): rewrite the SQL
  * spelling of Euclidean distance —
  * `sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
  *                 0D, (acc, v) -> acc + v))`
  * — to the fused native `l2_dist` kernel. SCALE.md r8 measured the
  * interpreted fold at 22× the native loop on the PQ-encode hot path;
  * this rule hands any SQL author the native kernel without them knowing
  * it exists. The substitution is exact: the kernel accumulates
  * left-to-right like the fold and reproduces its degenerate semantics
  * (NULL on length mismatch — zip_with's null-pad — and on null
  * elements), so rewritten plans are value-identical, not just faster.
  */
object RewriteL2Distance
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types.DoubleType

  private def isSquaredDiff(f: Expression, args: Seq[NamedExpression]): Boolean = f match {
    case Multiply(Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
                  Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _), _) =>
      args.length == 2 &&
        x1.exprId == args(0).exprId && y1.exprId == args(1).exprId &&
        x2.exprId == args(0).exprId && y2.exprId == args(1).exprId
    case _ => false
  }

  private def isPlainSum(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Add(a: NamedLambdaVariable, v: NamedLambdaVariable, _), args, _) =>
      args.length == 2 && a.exprId == args(0).exprId && v.exprId == args(1).exprId
    case _ => false
  }

  private def isIdentity(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg), _) => v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case Sqrt(ArrayAggregate(
            ZipWith(a, b, LambdaFunction(sq, zipArgs, _)),
            Literal(0.0, DoubleType), merge: LambdaFunction, finish: LambdaFunction))
          if isSquaredDiff(sq, zipArgs) && isPlainSum(merge) && isIdentity(finish) =>
        org.apache.spark.sql.graft.EuclideanDistance(a, b)
    }
}

/** SparkSessionExtensions entry point (SURVEY.md §7.2's extension path):
  * registers the engine's native functions so they're usable from SQL
  * (`SELECT cosine_sim(a, b)`) as well as the Column API, and injects
  * the `RewriteL2Distance` optimizer rule. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteL2Distance)

    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children(0), children(1))
      }))

    // Catalyst's runtime-row-level-filter sketch pair, surfaced as SQL
    // functions (Spark keeps them optimizer-internal; the expressions are
    // public classes). This is what ScaleOps.bloomPrunedJoin builds on —
    // the manual form of the shuffle-join prefilter the optimizer's
    // runtime bloom filter injects when statistics allow it.
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => children match {
        case Seq(c)       => new BloomFilterAggregate(c)
        case Seq(c, n)    => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException("bloom_agg takes 1-3 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "bloom_might_contain"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "bloom_might_contain takes exactly 2 arguments")
        new BloomFilterMightContain(children(0), children(1))
      }))
  }
}
