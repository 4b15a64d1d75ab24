package graft

import graft.operators.{DedupOps, GraphOps}

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pagerankMicros: path graph A-B-C, hand-computed exact integer ranks " +
       "after 2 rounds; center outranks leaves") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    // r0 = 1e6 each. Round 1: A,C get 85%*(1e6 div 2)=425000 -> 575000;
    // B gets 85%*(1e6+1e6) -> 1850000. Round 2: A,C <- 1850000 div 2;
    // B <- 575000 + 575000.
    val r = GraphOps.pagerankMicros(edges, iterations = 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(
      1L -> (150000L + 85L * (1850000L / 2) / 100),
      2L -> (150000L + 85L * (575000L + 575000L) / 100),
      3L -> (150000L + 85L * (1850000L / 2) / 100)))
    assert(r(2L) > r(1L))
  }

  test("pair index: persisted edges reproduce inline pagerank AND inline " +
       "component collapse exactly (at-rest round trip)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the old barn", "en", "s1", 60L),
      (2L, "the quick brown fox jumps over the lazy dog near the old barn", "en", "s2", 60L),
      (3L, "the quick brown fox jumps over the lazy dog near the red barn", "en", "s1", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_pair_spec").toString
    DedupOps.writePairIndex(docs, dir)
    val stored = DedupOps.pairIndex(spark, dir)
    assert(stored.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      DedupOps.minhashCandidatePairs(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(GraphOps.docPagerankFromPairs(stored).collect().map(_.toString).toSet ==
      GraphOps.docPagerank(docs).collect().map(_.toString).toSet)
    assert(DedupOps.dupComponents(stored).collect().map(_.toString).toSet ==
      DedupOps.dupComponents(DedupOps.minhashCandidatePairs(docs))
        .collect().map(_.toString).toSet)
  }

  test("docPagerank: nodes are exactly the near-dup pair endpoints; a " +
       "symmetric dup triangle converges to equal ranks") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the old barn", "en", "s1", 60L),
      (2L, "the quick brown fox jumps over the lazy dog near the old barn", "en", "s2", 60L),
      (3L, "the quick brown fox jumps over the lazy dog near the red barn", "en", "s1", 60L),
      (4L, "completely different words appear here without any overlap whatsoever today again", "de", "s2", 80L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = DedupOps.minhashCandidatePairs(docs).collect()
      .map(p => (p.getLong(0), p.getLong(1)))
    val endpoints = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val r = GraphOps.docPagerank(docs).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet == endpoints, s"rank nodes $r vs pair endpoints $endpoints")
    assert(!r.contains(4L), "the unrelated doc is not in the dup graph")
    // if the candidate graph is the complete triangle {1,2,3}, symmetry
    // forces equal mass: every node keeps exactly its initial 1e6
    if (pairs.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L))) {
      assert(r.values.toSet == Set(1000000L), s"symmetric triangle: $r")
    }
  }
}
