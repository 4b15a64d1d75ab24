package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityOps

/** Blocked fuzzy entity resolution: candidate generation respects the
  * block, the DP distance matches hand values, and canonicalization is
  * TRANSITIVE (chain merges collapse to one component even when the
  * endpoints exceed the pair threshold).
  */
class EntityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzyNameMatch: same-block pairs only, hand-checked distances, " +
       "row support carried") {
    val df = Seq(
      "red bolt", "red bolt", "red bolt", // 3 rows of one value
      "ted bolt",                         // dist 1 from red bolt
      "tan bolt",                         // dist 3 from red bolt, 2 from ted
      "blue bolt",                        // dist 4 from red bolt — OUT (> 3)
      "red gear", "red gear"              // other block entirely
    ).toDF("name")
    val m = EntityOps.fuzzyNameMatch(df, "name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    // no cross-block (bolt vs gear) pair may appear even though
    // levenshtein("red bolt", "red gear") = 3 would pass the threshold
    assert(!m.exists { case (a, b, _, _, _) => a.contains("gear") ^ b.contains("gear") })
    assert(m.contains(("red bolt", "ted bolt", 1, 3L, 1L)))
    assert(m.contains(("red bolt", "tan bolt", 3, 3L, 1L)))
    assert(m.contains(("tan bolt", "ted bolt", 2, 1L, 1L)))
    assert(!m.exists { case (a, b, _, _, _) => a == "blue bolt" || b == "blue bolt" },
      "blue bolt is 4 edits from every other bolt — must not match")
    assert(m.size == 3)
  }

  test("fuzzyCanonicalize: transitive chains collapse to one canonical " +
       "value; unmatched values stay their own canonical") {
    // chain: "aaaa bolt" ~ "aabb bolt" (2) ~ "bbbb bolt" (2), but the
    // endpoints are 4 apart — only transitivity merges them
    val df = Seq(
      "aaaa bolt", "aabb bolt", "bbbb bolt",
      "zzzz gear", "zzzz gear").toDF("name")
    val got = EntityOps.fuzzyCanonicalize(df, "name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("aaaa bolt", 3L, 3L),  // 3 variants, 3 rows
      ("zzzz gear", 1L, 2L))) // singleton value keeps itself, 2 rows
  }

  test("levenshtein agrees with the classic DP on asymmetric edits") {
    // the cross-engine contract the oracle relies on
    val r = spark.sql(
      "SELECT levenshtein('kitten', 'sitting'), levenshtein('red', 'tan'), " +
      "levenshtein('abc', 'abc'), levenshtein('', 'abc')").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) == ((3, 3, 0, 3)))
  }

  test("erBlockingAudit: hand-computed reduction ratio and hottest block; " +
       "degenerate one-value frame reads NULL ratio") {
    import spark.implicits._
    // blocks: apple {red apple, green apple}, sky {blue sky} →
    // candidates 1 of 3 total pairs → reduction (2·1e6 + 1) div 3
    val df = Seq("red apple", "green apple", "blue sky", "red apple")
      .toDF("p_name")
    val r = EntityOps.erBlockingAudit(df, "p_name").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((3L, 2L, 2L, 1L, 3L)), r.toString)
    assert(r.getLong(5) == (2L * 1000000L + 1L) / 3L, s"reduction ${r.getLong(5)}")
    val one = Seq("solo name").toDF("p_name")
    assert(EntityOps.erBlockingAudit(one, "p_name").head().isNullAt(5),
      "a single value has no pair space to reduce")
  }

  test("fuzzyNameMatchDel1: finds every ed<=1 pair with no block key, " +
       "rejects the shared-deletion ed-2 false positive, beats blocked recall") {
    import spark.implicits._
    val df = Seq("cat", "cat", "cut", "cats", "dog", "ab", "ba")
      .toDF("p_name")
    val got = EntityOps.fuzzyNameMatchDel1(df, "p_name").collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getInt(2), r.getLong(3), r.getLong(4))))
      .toMap
    // substitution (cat~cut), insertion (cat~cats); ab/ba share deletion
    // "b" and "a" but ed=2 → must be filtered by the verify step
    assert(got.keySet == Set(("cat", "cut"), ("cat", "cats")), got.toString)
    assert(got(("cat", "cut")) == ((1, 2L, 1L)), "row supports ride through")
    // recall >= the blocked variant at the same threshold: single-token
    // names block on themselves, so blocked ER finds NONE of these pairs
    val blocked = EntityOps.fuzzyNameMatch(df, "p_name", maxDist = 1).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(blocked.subsetOf(got.keySet))
  }

  test("JaroWinkler expression: textbook values, the 0.7 boost threshold, " +
       "and null/empty conventions match the oracle contract") {
    import spark.implicits._
    import org.apache.spark.sql.graft.JaroWinkler
    // textbook pairs (values cross-checked against DuckDB's
    // jaro_winkler_similarity during the bit-exactness fuzz)
    assert(JaroWinkler.jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(JaroWinkler.jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(JaroWinkler.jw("DWAYNE", "DUANE") == 0.8400000000000001)
    // jaro >= 0.7 but zero common prefix: boost is a no-op
    assert(JaroWinkler.jw("CRATE", "TRACE") == 0.7333333333333334)
    // jaro < 0.7 with a 2-char prefix: boost MUST NOT apply
    assert(JaroWinkler.jw("aaac", "aabd") == 0.6666666666666666)
    assert(JaroWinkler.jw("abc", "abc") == 1.0)
    assert(JaroWinkler.jw("abc", "xyz") == 0.0)
    assert(JaroWinkler.jw("", "abc") == 0.0 && JaroWinkler.jw("a", "") == 0.0)
    // Column path: codegen'd result equals the object method; null -> null
    val df = Seq(("MARTHA", "MARHTA"), ("CRATE", "TRACE"), (null, "x"))
      .toDF("a", "b")
    val got = df.select(
      graft.functions.GraftFunctions.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).contains(0.9611111111111111) &&
      got(1).contains(0.7333333333333334) && got(2).isEmpty, got.toSeq.toString)
  }

  test("jwNamePairs: surfaces the long-name near-miss a maxDist cutoff " +
       "keeps, scores in half-up ppm, respects the block key") {
    import spark.implicits._
    val df = Seq(
      "promo burnished atomic steel grove",
      "promo burnishec atomic steel grove",  // 1 sub, same block "grove"
      "promo burnished atomic steel plate",  // different block -> never paired
      "grove")                                // same block, far string
      .toDF("p_name")
    val got = EntityOps.jwNamePairs(df, "p_name", minPpm = 880000L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.size == 1, got.toString)
    val ((a, b), ppm) = got.head
    assert(a.contains("burnishec") || b.contains("burnishec"), got.toString)
    val exp = math.round(org.apache.spark.sql.graft.JaroWinkler.jw(a, b) * 1e6)
    assert(ppm == exp && ppm >= 880000L && ppm < 1000000L, s"$ppm vs $exp")
  }

  test("erSortedNeighborhood: catches the shared-prefix pair blocking " +
       "misses, respects the w-position budget, carries row support") {
    import spark.implicits._
    // "alpha tone" / "alpha tonf" end in different blocks (tone vs tonf)
    // so fuzzyNameMatch can NEVER pair them; sorted order puts them
    // adjacent. "zz far" is within ed 3 of nothing nearby.
    val df = Seq("alpha tone", "alpha tonf", "alpha tonf", "beta tone", "zz far")
      .toDF("p_name")
    val got = EntityOps.erSortedNeighborhood(df, "p_name", w = 3, maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.contains(("alpha tone", "alpha tonf")), got.toString)
    assert(got(("alpha tone", "alpha tonf")) == ((1, 1L, 2L)), got.toString)
    val blocked = EntityOps.fuzzyNameMatch(df, "p_name", maxDist = 3).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(!blocked.contains(("alpha tone", "alpha tonf")),
      "the blocked tier misses the cross-block pair by construction")
    // w = 1 budget: only rank-adjacent candidates are even considered
    // 4 DISTINCT values -> 3 rank-adjacent candidates at w=1
    val w1 = EntityOps.erSortedNeighborhood(df, "p_name", w = 1, maxDist = 10)
      .count()
    assert(w1 == 3L, s"n-1 adjacent candidate pairs at w=1: $w1")
  }

  test("fsEmWeights: a clean two-cluster mixture separates — lambda " +
       "finds the planted match share, m-probabilities rise, " +
       "u-probabilities fall, and the run is deterministic") {
    import spark.implicits._
    // 50 all-agree pairs (the matches), 950 all-disagree (the noise)
    val pairs = (Seq.fill(50)((true, true, true)) ++
      Seq.fill(950)((false, false, false))).toDF("g1", "g2", "g3")
    val r = EntityOps.fsEmWeights(pairs).head()
    assert(r.getLong(0) == 1000L, r.toString)
    val lam = r.getLong(1)
    assert(lam > 30000L && lam < 80000L, s"planted 5% prevalence: $r")
    assert(r.getLong(2) > 900000L && r.getLong(3) > 900000L && r.getLong(4) > 900000L,
      "agreement is match evidence: " + r)
    assert(r.getLong(5) < 100000L && r.getLong(6) < 100000L && r.getLong(7) < 100000L,
      "agreement is rare among non-matches: " + r)
    assert(EntityOps.fsEmWeights(pairs).head() == r, "EM replays exactly")
  }

  test("fsMatchClassify: the all-agree pattern lands in 'match', the " +
       "all-disagree mass in 'nonmatch', and pair counts conserve") {
    import spark.implicits._
    val pairs = (Seq.fill(50)((true, true, true)) ++
      Seq.fill(950)((false, false, false))).toDF("g1", "g2", "g3")
    val got = EntityOps.fsMatchClassify(pairs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("match").getLong(1) == 50L, got.toString)
    assert(got("nonmatch").getLong(1) == 950L, got.toString)
    assert(got.values.map(_.getLong(1)).sum == 1000L, "pairs conserve")
    assert(got("match").getAs[Long]("min_w_ppm") >= 900000L, got.toString)
    assert(got("nonmatch").getAs[Long]("max_w_ppm") < 100000L, got.toString)
  }
}
