package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Measures the star-contraction round bound against min-label propagation
  * on a pathological-diameter dup graph — the corpus shape where a
  * boilerplate page is mutated once per crawl snapshot, so every snapshot
  * near-dups ONLY its neighbors and the candidate-pair graph is one long
  * path (diameter = snapshots − 1). On benign corpora (small dense
  * clusters) min-label's cheaper rounds win; this bench quantifies the
  * regime where `dupComponentsStar`'s O(log²) round bound is the
  * difference between converging and blowing the round cap. Results land
  * in SCALE.md.
  *
  * The pair frame is constructed directly in the candidate-pair shape
  * both collapsers consume (the output of minhashCandidatePairs /
  * simhashCandidatePairs on such a snapshot chain); generating real
  * chained-mutation texts adds LSH shortcut edges k↔k+2 that shrink the
  * diameter and would understate min-label's cost.
  *
  * Usage: runMain graft.ComponentScaleBench [chainLength]
  */
object ComponentScaleBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val spark = GraftSession.getOrCreate("graft-component-bench")
    val pairs = spark.range(1, n.toLong)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))

    def timed(f: => Long): (Long, Double, Int) = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      (rows, sec, spark.conf.get("spark.graft.componentRounds").toInt)
    }

    // warm-up so neither contender pays first-query codegen/session costs
    DedupOps.dupComponentsStar(pairs, maxIters = 30).count()

    val (starRows, starSec, starRounds) =
      timed(DedupOps.dupComponentsStar(pairs, maxIters = 30).count())
    // min-label at the DEFAULT cap must refuse (diameter n-1 > 20) — the
    // failure mode the star variant exists to remove
    val defaultCapThrows =
      try { DedupOps.dupComponents(pairs).count(); false }
      catch { case _: IllegalStateException => true }
    // and with the cap lifted it pays diameter rounds
    val (minRows, minSec, minRounds) =
      timed(DedupOps.dupComponents(pairs, maxIters = n + 5).count())

    require(starRows == minRows, s"label cardinality differs: $starRows vs $minRows")
    println(
      s"""{"chain_n":$n,"star_rounds":$starRounds,"star_sec":${math.round(starSec * 10) / 10.0},""" +
      s""""minlabel_rounds":$minRounds,"minlabel_sec":${math.round(minSec * 10) / 10.0},""" +
      s""""minlabel_default_cap_throws":$defaultCapThrows}""")
    spark.stop()
  }
}
