package graft

import org.apache.spark.sql.functions._
import graft.operators.StatsOps

/** Ladder for the per-source KS drift screen at fact-scale VALUE
  * cardinality (r10 verdict item 7). The stress ScaleDataGen corpora
  * multiply ROWS but saturate `n_chars` cardinality (~800 distinct at
  * ×100 — token-suffix growth reuses lengths), which is exactly the
  * regime the exact grid is safe in. What the exact KS fears is the
  * VALUE axis: its grid is #sources × #distinct values. This bench
  * widens the value domain to ~one distinct value per document
  * (v = n_chars·10⁶ + doc_id mod 10⁶ — the shape of a continuous drift
  * column like a float score or an exact byte size), then times the
  * exact screen against the binned fallback at the SAME row count, so
  * the measured gap is attributable to value cardinality alone.
  * Results land in SCALE.md.
  *
  * Usage: runMain graft.KsScaleBench [sfDir ...]
  */
object KsScaleBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/g10", "/tmp/g100")
    val spark = GraftSession.getOrCreate("graft-ks-bench")

    def timedMin2(f: => Long): (Long, Double) = {
      f // warm-up
      def once: (Long, Double) = {
        val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
      }
      val (r1, s1) = once; val (_, s2) = once
      (r1, math.min(s1, s2))
    }

    dirs.foreach { d =>
      val docs = graft.sources.Tables.load(spark, d, "documents")
        .withColumn("n_chars",
          col("n_chars") * lit(1000000L) + pmod(col("doc_id"), lit(1000000L)))
      val nv = docs.select(col("n_chars")).distinct().count()
      val (re, se) = timedMin2(StatsOps.ksSourceDrift(docs).count())
      val (rb, sb) = timedMin2(StatsOps.ksSourceDriftBinned(docs, bins = 20).count())
      println(f"KSLADDER dir=$d distinct=$nv exact_rows=$re exact_s=$se%.2f " +
        f"binned_rows=$rb binned_s=$sb%.2f")
    }
    spark.stop()
  }
}
