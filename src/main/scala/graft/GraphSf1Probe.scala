package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Measurement harness for the graph tier's BUILD-side contract: times
  * the NN-descent build vs the one-shot LSH-bucket build and measures
  * beam-search recall@5 vs brute at the three gate SFs and the sf1
  * ladder fixture. The nBits-raising alternative was measured first and
  * rejected here: at sf1 (nBits = 8) sign-bit collisions emptied the
  * buckets of true neighbors and recall@5 read 0.000.
  *
  * Usage: runMain graft.GraphSf1Probe [descentRounds]
  */
object GraphSf1Probe {
  def main(args: Array[String]): Unit = {
    val descentRounds = args.headOption.map(_.toInt).getOrElse(2)
    val spark = GraftSession.getOrCreate("graft-graph-sf1-probe")
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1", "/tmp/graft_sf1_ladder")
    for (dir <- dirs) {
      val emb = graft.sources.Tables.load(spark, dir, "embeddings").persist()
      val n = emb.count()
      val (beam, rounds, graphK, seeds) = SimilarityOps.graphKnobs(n)
      val brute = SimilarityOps.cosineTopK(emb, 10, 5)
        .select(col("q_id"), col("vec_id")).persist()
      brute.count()
      def recallOf(edges: org.apache.spark.sql.DataFrame): Double = {
        val hits = SimilarityOps.graphAnnTopKOver(emb, edges, 10, 5,
            beam, rounds, seeds)
          .select(col("q_id"), col("vec_id")).withColumn("hit", lit(1L))
        brute.join(hits, Seq("q_id", "vec_id"), "left")
          .agg((sum(coalesce(col("hit"), lit(0L))) / count(lit(1))).as("r"))
          .head().getDouble(0)
      }
      val t0 = System.nanoTime()
      val desc = SimilarityOps.knnGraphDescent(emb, graphK, descentRounds)
      val sym = desc.unionByName(
        desc.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        .localCheckpoint()
      val tBuild = (System.nanoTime() - t0) / 1e9
      val rec = recallOf(sym)
      println(f"[graph-descent] $dir%-24s n=$n%6d rounds=$descentRounds " +
        f"build=$tBuild%6.1f s recall@5=$rec%.3f")
      brute.unpersist(); emb.unpersist(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
