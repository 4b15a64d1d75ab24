package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import org.apache.spark.sql.graft.CosineSimilarity

/** SparkSessionExtensions entry point (SURVEY.md §7.2's extension path):
  * registers the engine's native functions so they're usable from SQL
  * (`SELECT cosine_sim(a, b)`) as well as the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
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
