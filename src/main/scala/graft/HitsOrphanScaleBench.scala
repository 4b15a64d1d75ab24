package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, RelationalOps}

/** Ladder for the tranche XIX–XX additions with nontrivial scale
  * shapes:
  *
  *  - `GraphOps.hitsBipartite` — 6 mutual-reinforcement rounds, each
  *    two co-partitioned equi-joins + partial-agg shuffles over the
  *    edge list. Cost must scale linearly in edges with a flat
  *    per-round constant (the pagerank shape), independent of the
  *    hub/authority skew the synthetic cloud plants (one auth absorbs
  *    ~0.1% of all edges — partial aggregation must flatten it before
  *    the shuffle).
  *  - `RelationalOps.fkOrphanAudit` on a FACT-scale parent (the
  *    orders-shaped edge): a distinct over the parent keys + one
  *    shuffle equi-join; must stay linear, and the 1% planted orphans
  *    must be counted exactly (the assert doubles as a correctness
  *    canary at every rung).
  *
  * Usage: runMain graft.HitsOrphanScaleBench [hits|orphan|both] [rows ...]
  * Results land in SCALE.md (min of 2 after warm-up, local[32]).
  */
object HitsOrphanScaleBench {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.filter(a => !a.forall(_.isDigit)).getOrElse("both")
    val numArgs = args.dropWhile(a => !a.forall(_.isDigit))
    val sizes = if (numArgs.nonEmpty) numArgs.toSeq.map(_.toLong)
      else Seq(1000000L, 10000000L, 100000000L)
    val spark = GraftSession.getOrCreate("graft-hits-orphan-bench")

    def timedMin2(f: => Unit): Double = {
      f
      def once: Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once, once)
    }

    sizes.foreach { n =>
      if (which == "hits" || which == "both") {
        val hubs = math.max(n / 50, 10L)
        val auths = math.max(n / 200, 10L)
        // uniform bipartite cloud + a hot authority taking ~0.1% of edges
        val edges = spark.range(n).select(
          pmod(col("id") * 7919L, lit(hubs)).as("hub"),
          when(pmod(col("id"), lit(1000L)) === 0L, 0L)
            .otherwise(pmod(col("id") * 104729L, lit(auths))).as("auth"))
        val t = timedMin2 {
          val out = GraphOps.hitsBipartite(edges)
          // force full evaluation without collecting scores
          assert(out.agg(max(col("score_ppm"))).head().getLong(0) == 1000000L)
        }
        println(f"[hits] edges=$n%d sec=$t%.2f")
      }
      if (which == "orphan" || which == "both") {
        val parents = math.max(n / 10, 10L)
        // 1% of children reference a key past the parent range
        val child = spark.range(n).select(
          when(pmod(col("id"), lit(100L)) === 0L, col("id") + lit(parents))
            .otherwise(pmod(col("id") * 7919L, lit(parents))).as("k"))
        val parent = spark.range(parents).select(col("id").as("k"))
        val t = timedMin2 {
          val row = RelationalOps.fkOrphanAudit(Seq(("child->parent", child, parent)))
            .head()
          // ids 0, 100, ... are planted orphans: ceil(n/100) of them
          assert(row.getLong(2) == (n + 99) / 100,
            s"planted orphan count: ${row.getLong(2)} vs ${(n + 99) / 100}")
        }
        println(f"[orphan] child=$n%d sec=$t%.2f")
      }
    }
    spark.stop()
  }
}
