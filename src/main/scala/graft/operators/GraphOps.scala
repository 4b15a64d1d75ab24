package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over document-relation graphs — the family
  * the dup-component collapse (`DedupOps.dupComponents`) opened, extended
  * to weighted-importance scoring. The motivating pipeline use: rank docs
  * by their centrality in the near-dup/overlap graph, so sampling and
  * retention decisions can prefer canonical cluster centers over
  * peripheral variants (cf. reference README's quality-tier retention;
  * the reference itself has no graph tier — pure [EXT]).
  *
  * All arithmetic is integer micros end-to-end: rank mass starts at
  * 1e6 per node, contributions use integer division by degree, damping
  * is (85 * x) div 100. Everything downstream of the edge list is
  * therefore bit-identical in any engine — the same quantization
  * discipline as the dedup/audit rollups, applied to an ITERATIVE
  * computation where float drift would otherwise compound per round.
  */
object GraphOps {

  /** Integer-micros PageRank. `edges` is a directed (src, dst) frame;
    * for undirected graphs callers pass both directions. Nodes are the
    * distinct srcs (for symmetrized graphs = every endpoint, so no
    * dangling-mass term; pure sinks would leak their mass — symmetrize
    * or add self-loops first).
    *
    * Scale shape: degree is computed ONCE (partial-agg shuffle on src),
    * the edge frame is joined back and reused by every iteration; each
    * round is one co-partitioned join on src plus one partial-agg
    * shuffle on dst — the textbook distributed PageRank step with no
    * driver-side state. `localCheckpoint` every 4 rounds bounds lineage
    * the same way the min-label collapse does; ranks are narrow
    * (node, long) rows throughout.
    */
  def pagerankMicros(edges: DataFrame, iterations: Int = 8): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "src")
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("rank_micros"))
    for (i <- 1 to iterations) {
      ranks = withDeg.join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst").as("node"), expr("rank_micros div deg").as("c"))
        .groupBy(col("node"))
        .agg(expr("150000L + (85L * sum(c)) div 100L").as("rank_micros"))
      if (i % 4 == 0 && i < iterations) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** PageRank over the MinHash near-dup graph: LSH candidate pairs
    * symmetrized into an undirected edge list, 8 damped rounds. High
    * rank = central variant of a large dup cluster (the copy everything
    * else resembles); rank ~150000 = peripheral one-off overlap.
    */
  def docPagerank(documents: DataFrame, iterations: Int = 8): DataFrame =
    docPagerankFromPairs(DedupOps.minhashCandidatePairs(documents), iterations)

  /** Same ranking from a prebuilt (doc_a, doc_b) pair frame — the
    * persisted pair-index consumer: probes skip the signature → band →
    * bucket-join derivation entirely.
    */
  def docPagerankFromPairs(pairs: DataFrame, iterations: Int = 8): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    pagerankMicros(edges, iterations)
      .select(col("node").as("doc_id"), col("rank_micros"))
  }
}
