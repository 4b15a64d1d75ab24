package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.ShardedOrder

/** Ladder for the sharded exact global rank (r10 verdict item 5): the
  * single-reducer `Window.orderBy` against `ShardedOrder.withGlobalRank`
  * on a synthetic (value, id) frame whose values collide heavily (1000
  * distinct values — ties force the id tie-break everywhere). Both
  * produce identical ranks (spec-pinned); this measures the wall-clock
  * shape as rows grow ×100. Results land in SCALE.md.
  *
  * Usage: runMain graft.ShardedOrderScaleBench [rows ...]
  */
object ShardedOrderScaleBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(1000000L, 10000000L, 100000000L)
    val spark = GraftSession.getOrCreate("graft-shardedorder-bench")

    def timedMin2(f: => Long): Double = {
      f
      def once: Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once, once)
    }

    sizes.foreach { n =>
      val df = spark.range(n).select(col("id"),
        pmod(col("id") * 7919L, lit(1000L)).as("x"))
      val sharded = timedMin2(
        ShardedOrder.withGlobalRank(df, "i", 32, col("x"), col("id"))
          .agg(sum(col("i"))).head().getLong(0))
      val single = timedMin2(
        df.withColumn("i", row_number().over(Window.orderBy(col("x"), col("id"))))
          .agg(sum(col("i"))).head().getLong(0))
      println(f"SHARDLADDER rows=$n sharded_s=$sharded%.2f single_reducer_s=$single%.2f")
    }
    spark.stop()
  }
}
