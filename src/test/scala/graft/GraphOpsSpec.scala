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

  test("triangleStats: K4 gives every node 3 triangles at coefficient 1e6; " +
       "a star and a path have none") {
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b))
      .toDF("doc_a", "doc_b")
    val r = GraphOps.triangleStats(k4).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
    // C(3,2)=3 triangles per corner of K4, deg 3, 2*3*1e6/(3*2) = 1e6
    assert(r.values.toSet == Set((3L, 3L, 1000000L)), s"K4 stats: $r")

    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("doc_a", "doc_b")
    assert(GraphOps.triangleStats(star).isEmpty, "stars are triangle-free")
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    assert(GraphOps.triangleStats(path).isEmpty, "paths are triangle-free")
  }

  test("triangleStats: degree-ordered orientation matches naive id-ordered " +
       "enumeration on a skewed fixture (hub + cliques)") {
    // hub node 100 connected to everything (the boilerplate-overlap shape
    // the orientation exists to tame) + two disjoint triangles
    val edges = (Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L)) ++
      (1L to 6L).map(n => (n, 100L))).toDF("doc_a", "doc_b")
    val fast = GraphOps.triangleStats(edges).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // naive: enumerate a<b<c with all three edges present
    val es = edges.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    def has(a: Long, b: Long) = es.contains((math.min(a, b), math.max(a, b)))
    val nodes = es.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val naive = (for {
      a <- nodes; b <- nodes if b > a && has(a, b)
      c <- nodes if c > b && has(a, c) && has(b, c)
    } yield Seq(a, b, c)).flatten.groupBy(identity).map { case (n, l) => n -> l.size.toLong }
    assert(fast == naive, s"fast $fast vs naive $naive")
    // the hub closes a triangle with each clique edge: 6 of them
    assert(fast(100L) == 6L)
  }

  test("labelPropagation: a single bridge edge between two triangles does " +
       "NOT merge them (the over-merge min-label components commit)") {
    import spark.implicits._
    import graft.operators.DedupOps
    // triangles {1,2,3} and {10,11,12} joined only by bridge 3-10
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (3L, 10L)).toDF("doc_a", "doc_b")
    val lpa = GraphOps.docCommunitiesFromPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-simulated 4 synchronous rounds (majority, ties -> min label):
    // the left triangle converges to 1, the right to 3 — two communities
    assert(lpa == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L), s"got $lpa")
    assert(lpa.values.toSet.size == 2, "LPA must keep the two families apart")
    // while the connected-component collapse fuses everything across the
    // bridge into ONE cluster — the contrast that motivates LPA
    val comps = DedupOps.dupComponents(pairs).collect()
      .map(r => r.getLong(1)).toSet
    assert(comps.size == 1, "components merge across the bridge by design")
  }

  test("labelPropagation: deterministic under repartitioning") {
    import spark.implicits._
    val pairs = (0L until 40L).flatMap { i =>
      Seq((i, (i + 1) % 40), (i, (i + 7) % 40))
    }.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("doc_a", "doc_b")
    val base = GraphOps.docCommunitiesFromPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val re = GraphOps.docCommunitiesFromPairs(pairs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base == re)
  }

  test("kCore: a tailed triangle keeps exactly the triangle; a path peels " +
       "to nothing; the round bound is the documented chain trade") {
    import spark.implicits._
    // triangle 1-2-3 + tail 3-4: node 4 (deg 1) peels, triangle survives
    // with in-core degree 2 everywhere
    val tailed = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val core = GraphOps.kCore(tailed).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), core.toString)
    // a pure path has no 2-core at all (endpoints peel until empty)
    val path = (1L to 8L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("doc_a", "doc_b")
    assert(GraphOps.kCore(path).count() == 0, "a chain has no 2-core")
    // a 30-node chain peels ~2 nodes/round: 8 rounds leave a remnant,
    // 16 clear it — the documented rounds-vs-diameter trade
    val long = (1L to 30L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("doc_a", "doc_b")
    assert(GraphOps.kCore(long, rounds = 8).count() > 0, "8 rounds: remnant remains")
    assert(GraphOps.kCore(long, rounds = 16).count() == 0, "16 rounds: fully peeled")
    // extra rounds past convergence are the identity
    val again = GraphOps.kCore(tailed, rounds = 12).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == core)
  }

  test("adamicAdar: path predicts its endpoints at exactly 1e6/ln2; a " +
       "closed triangle predicts nothing; hub wedge-centers are capped out") {
    import spark.implicits._
    // path 1-2-3: the only wedge is centered on 2 (deg 2) → (1,3) at
    // round(1e6/ln 2) = 1442695; square 1-2-3-4: both diagonals score 2×
    val path = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val p = GraphOps.adamicAdar(path).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(p == Map((1L, 3L) -> ((1L, 1442695L))), p.toString)
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("doc_a", "doc_b")
    val sq = GraphOps.adamicAdar(square).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(sq == Map((1L, 3L) -> ((2L, 2885390L)), (2L, 4L) -> ((2L, 2885390L))),
      sq.toString)
    // triangle: the (1,3) wedge closes an EXISTING edge → no prediction
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    assert(GraphOps.adamicAdar(tri).count() == 0, "closed wedges predict nothing")
    // a center above maxDeg contributes no wedges (the quadratic guard)
    val star = (1L to 60L).map(i => (math.min(0L, i), math.max(0L, i)))
      .map { case (a, b) => (a, b) }.toDF("doc_a", "doc_b")
    assert(GraphOps.adamicAdar(star, maxDeg = 50).count() == 0,
      "a 60-degree hub must be capped out of wedge generation")
  }

  test("eigenvectorCentralityFromPairs: the clique outranks its pendant, " +
       "the max-normalized score tops out at exactly 1e6") {
    import spark.implicits._
    // triangle 1-2-3 (non-bipartite: the iteration converges) + pendant 4
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = GraphOps.eigenvectorCentralityFromPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 4 && got.values.max == 1000000L, got.toString)
    assert(got(3L) == 1000000L, s"the bridge node is the most central: $got")
    assert(got(4L) < got(1L) && got(1L) < got(3L), got.toString)
    assert(got.values.forall(v => v > 0L && v <= 1000000L), got.toString)
  }

  test("hitsBipartite: the part bought by broad buyers outranks the " +
       "equally-popular part bought by narrow ones; duplicate edges " +
       "don't double-count") {
    import spark.implicits._
    // hubs 1,2 buy widely (parts 10,11,12); hubs 3,4 buy only part 13.
    // parts 10 and 13 both have 2 buyers — but 10's buyers are hubs.
    val edges = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L), (2L, 12L),
      (3L, 13L), (4L, 13L),
      (3L, 13L) // duplicate purchase: must not add weight
    ).toDF("hub", "auth")
    val got = GraphOps.hitsBipartite(edges).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(("auth", 10L)) == got(("auth", 11L)), got.toString)
    assert(got(("auth", 10L)) > got(("auth", 13L)),
      s"hub-endorsed part must outrank the same-degree narrow part: $got")
    assert(got(("hub", 1L)) == 1000000L && got(("hub", 1L)) > got(("hub", 3L)))
    assert(got.values.forall(v => v > 0L && v <= 1000000L), got.toString)
  }

  test("degreeAssortativity: a star is maximally disassortative, a " +
       "clique-pair chain graph is regular (NULL), edge count is exact") {
    import spark.implicits._
    // star 0-{1..5}: every edge joins deg 5 to deg 1 -> r = -1 exactly
    val star = (1L to 5L).map(i => (0L, i)).toDF("doc_a", "doc_b")
    val rs = GraphOps.degreeAssortativity(star).head()
    assert(rs.getLong(0) == 5L, rs.toString)
    assert(rs.getLong(1) == -1000000L, "star reads r = -1: " + rs)
    // triangle: all degrees 2 -> zero degree variance -> NULL
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val rt = GraphOps.degreeAssortativity(tri).head()
    assert(rt.getLong(0) == 3L && rt.isNullAt(1), rt.toString)
  }

  test("modularity: two bridged triangles under the natural 2-community " +
       "split read Q = 70/196; the all-one-community split reads Q = 0 " +
       "(the null model exactly cancels)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("doc_a", "doc_b")
    // m=7, degrees 2,2,3,3,2,2; split {1,2,3}/{4,5,6}: Σe_c=6, deg_c=7,7
    // Q = (12·14 − 98)/14² = 70/196 = 0.357142857 → 357143 micros
    val split = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("doc_id", "community")
    val r = GraphOps.modularity(pairs, split).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 7L, 2L, 6L)), r.toString)
    assert(r.getLong(4) == 357143L, r.toString)
    // one community: intra2 = m2 and Σdeg_c² = m2² → Q = 0 exactly
    val one = (1L to 6L).map(i => (i, 1L)).toDF("doc_id", "community")
    assert(GraphOps.modularity(pairs, one).head().getLong(4) == 0L)
  }
}
