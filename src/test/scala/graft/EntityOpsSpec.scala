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
}
