package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Measurement harness behind the graph-ANN QUERY-side scale contract
  * (r13): recall@5 of [[SimilarityOps.graphAnnTopK]] (legacy LSH build)
  * vs brute across the three fixture SFs for a grid of (beam, rounds,
  * graphK, entrySeeds) knob rules — the data the beam-scaling rule and
  * the `ann_recall_graph` floor were pinned from, instead of guessed.
  * The BUILD-side contract (linear NN-descent + NSW long links) was
  * measured separately by [[GraphSf1Probe]] at the sf1 decade.
  *
  * Usage: runMain graft.GraphAnnKnobProbe
  */
object GraphAnnKnobProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("graft-graph-knob-probe")
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val grid = Seq(
      // (label, beam, rounds, graphK, entrySeeds): r12 shipping knobs first
      ("ship_r12", (_: Long) => (8, 3, 8, 4)),
      ("beam2log", (n: Long) => (2 * (64 - java.lang.Long.numberOfLeadingZeros(n)), 3, 8, 4)),
      ("beam4log", (n: Long) => (4 * (64 - java.lang.Long.numberOfLeadingZeros(n)), 3, 8, 4)),
      ("b4l_r4", (n: Long) => (4 * (64 - java.lang.Long.numberOfLeadingZeros(n)), 4, 8, 4)),
      ("b4l_seedlog", (n: Long) => {
        val lg = 64 - java.lang.Long.numberOfLeadingZeros(n)
        (4 * lg, 3, 8, 2 * lg)
      }),
      ("b4l_gk12", (n: Long) => (4 * (64 - java.lang.Long.numberOfLeadingZeros(n)), 3, 12, 4)),
      ("b6l_gk12_seedlog", (n: Long) => {
        val lg = 64 - java.lang.Long.numberOfLeadingZeros(n)
        (6 * lg, 3, 12, 2 * lg)
      }),
      ("b6l_gk16_seedlog", (n: Long) => {
        val lg = 64 - java.lang.Long.numberOfLeadingZeros(n)
        (6 * lg, 3, 16, 2 * lg)
      }),
      ("b6l_gk12_seed3l_r4", (n: Long) => {
        val lg = 64 - java.lang.Long.numberOfLeadingZeros(n)
        (6 * lg, 4, 12, 3 * lg)
      }),
      ("b8l_gk12_seedlog", (n: Long) => {
        val lg = 64 - java.lang.Long.numberOfLeadingZeros(n)
        (8 * lg, 3, 12, 2 * lg)
      }))
    for (sf <- sfs) {
      val emb = graft.sources.Tables.load(spark, sf, "embeddings").persist()
      val n = emb.count()
      val brute = SimilarityOps.cosineTopK(emb, 10, 5)
        .select(col("q_id"), col("vec_id")).persist()
      brute.count()
      for ((label, rule) <- grid) {
        val (beam, rounds, graphK, seeds) = rule(n)
        val hits = SimilarityOps.graphAnnTopK(emb, 10, 5,
            beam = beam, rounds = rounds, graphK = graphK, entrySeeds = seeds)
          .select(col("q_id"), col("vec_id")).withColumn("hit", lit(1))
        val rec = brute.join(hits, Seq("q_id", "vec_id"), "left")
          .agg((sum(coalesce(col("hit"), lit(0))) / count(lit(1))).as("r"))
          .head().getDouble(0)
        println(f"[graph-knobs] $sf%-24s n=$n%6d $label%-18s " +
          f"beam=$beam%3d rounds=$rounds graphK=$graphK%2d seeds=$seeds%3d " +
          f"recall@5=$rec%.3f")
      }
      brute.unpersist(); emb.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
