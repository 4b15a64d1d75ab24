package graft

import org.apache.spark.sql.functions._
import graft.operators.{RelationalOps, StatsOps}

/** Ladder for the r11 additions with nontrivial scale shapes:
  *
  *  - `RelationalOps.paretoFrontier` — the 2-D skyline whose oracle
  *    spelling is O(n²); the engine's per-x aggregate + sharded
  *    descending running-max scan should stay near-linear in rows. The
  *    synthetic cloud keeps distinct-x cardinality AT row scale (x =
  *    id-derived, ~unique) — the worst case for the dominance scan,
  *    since the scanned frame is as large as the input.
  *  - `StatsOps.bootstrapCi` — the B-fold (32×) broadcast expand +
  *    partial aggregate; cost must be a flat 32× of a plain scan-agg
  *    at every scale (no shuffle grows with B: the only shuffle is the
  *    32-group replicate aggregate).
  *
  * Usage: runMain graft.FrontierBootstrapScaleBench [pareto|bootstrap|both] [rows ...]
  * (the selector exists because at 10⁸ rows the two ops' retained
  * checkpoint/shuffle footprints don't co-reside in one 4.6 GiB local
  * JVM — measure each in its own process, as a cluster would)
  * Results land in SCALE.md (min of 2 after warm-up, local[32]).
  */
object FrontierBootstrapScaleBench {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.filter(a => !a.forall(_.isDigit)).getOrElse("both")
    val numArgs = args.dropWhile(a => !a.forall(_.isDigit))
    val sizes = if (numArgs.nonEmpty) numArgs.toSeq.map(_.toLong)
      else Seq(1000000L, 10000000L, 100000000L)
    val spark = GraftSession.getOrCreate("graft-frontier-bootstrap-bench")

    def timedMin2(f: => Unit): Double = {
      f
      def once: Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once, once)
    }

    sizes.foreach { n =>
      // near-unique x (7919 is coprime to any n here), anti-correlated y
      // with noise — a frontier of O(hundreds) points over a dense cloud
      if (which == "pareto" || which == "both") {
        val pts = spark.range(n).select(col("id"),
          pmod(col("id") * 7919L, lit(n)).as("x"),
          (lit(n) - pmod(col("id") * 7919L, lit(n))
            + pmod(col("id") * 104729L, lit(1000L))).as("y"))
        val frontier = timedMin2(
          RelationalOps.paretoFrontier(pts, "id", "x", "y")
            .write.format("noop").mode("overwrite").save())
        println(f"FRONTIERLADDER rows=$n pareto_s=$frontier%.2f")
      }
      if (which == "bootstrap" || which == "both") {
        val vals = spark.range(n).select(col("id"),
          (pmod(col("id") * 7919L, lit(10000L)).cast("double") / 100.0d).as("v"))
        val boot = timedMin2(
          StatsOps.bootstrapCi(vals, "id", "v")
            .write.format("noop").mode("overwrite").save())
        println(f"FRONTIERLADDER rows=$n bootstrap_s=$boot%.2f")
      }
    }
    spark.stop()
  }
}
