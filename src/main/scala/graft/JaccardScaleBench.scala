package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.DedupOps
import graft.sources.Tables

/** A/B harness for the exact-Jaccard tiers (unguarded inverted index vs
  * stop-shingle guard vs prefix filter) on corpora grown past the fixture
  * size — the measurement behind the SCALE.md "which exact tier at which
  * scale" table.
  *
  * The fixture corpus is expanded k× by generating per-doc variants with
  * deterministic token perturbations (every 7th token, phase-shifted by
  * variant index, gets a variant-specific suffix). That multiplies every
  * surviving shingle's document frequency by up to k — exactly the df
  * growth that makes the unguarded tier's O(df²) candidate generation blow
  * up at corpus scale, while output pairs stay sparse (variants of one doc
  * land near J ≈ 0.14, far under the 0.5 threshold).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.JaccardScaleBench 1 2 4"
  */
object JaccardScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ks = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 2, 4)
    val spark = GraftSession.getOrCreate("graft-jaccard-xbench")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    for (k <- ks) {
      val expanded =
        if (k == 1) docs
        else docs.crossJoin(spark.range(k).toDF("variant"))
          .select(
            (col("doc_id") * k + col("variant")).as("doc_id"),
            concat_ws(" ", expr(
              "transform(split(lower(text), '[^a-z0-9]+'), " +
                "(t, p) -> IF((p + variant) % 7 = 0, concat(t, '_x', variant), t))"))
              .as("text"))
      expanded.persist()
      val n = expanded.count()
      def time(name: String, f: => DataFrame): Unit = {
        f.write.format("noop").mode("overwrite").save() // warm-up pass
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val rows = f.count()
        println(f"[xbench] k=$k docs=$n $name%-10s ${dt}%7.2f s  out=$rows")
      }
      time("unguarded", DedupOps.jaccardPairs(expanded, 0.5))
      time("guarded50", DedupOps.jaccardPairs(expanded, 0.5, maxShingleDocFreq = 50))
      time("prefix", DedupOps.jaccardPairsPrefix(expanded, 0.5))
      expanded.unpersist()
    }
    spark.stop()
  }
}
