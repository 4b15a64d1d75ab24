package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators for scale (SURVEY.md §4 / the 100 TB
  * discipline): bucketed co-located joins and salt-based skew mitigation.
  * Neither changes query semantics — both exist to control where shuffles
  * happen, which is the whole game at cluster scale.
  */
object ScaleOps {

  /** Write a table bucketed (and sorted) by the join key. Two tables
    * bucketed the same way join with ZERO exchange — the sort-merge join
    * reads co-located buckets directly. This is how the fact-to-fact joins
    * (lineitem ⋈ orders at 100 TB) avoid re-shuffling terabytes on every
    * query: pay the shuffle once at write time.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Salted inner equi-join for skewed keys. The hot side's key is salted
    * into `salt` shards; the other side is replicated across all shards
    * (explode of a literal range — cheap when that side is the smaller
    * one). Splits a hot key's rows across `salt` tasks instead of one
    * straggler. AQE's skew-join handles sort-merge skew automatically;
    * this is the explicit form for when AQE can't see it (e.g. the skew
    * appears after an aggregation, or the join is broadcast-ineligible
    * but one key dominates).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedLeft = skewed.withColumn("__salt", (rand(seed = 42) * salt).cast("int"))
    val replicatedRight = other.withColumn("__salt", explode(expr(s"sequence(0, ${salt - 1})")))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-pruned shuffle join: build a bloom filter over the small side's
    * join keys (one aggregate → a KB-scale sketch), broadcast it, and
    * prefilter the big side BEFORE its shuffle — at 100 TB this is the
    * difference between shuffling the whole fact table and shuffling only
    * the ~selectivity fraction that can possibly match. The final equi-join
    * clears bloom false positives, so the result is exactly the plain
    * join. This is the manual, always-on form of Spark's runtime row-level
    * filtering (`spark.sql.optimizer.runtime.bloomFilter.*`), for when
    * statistics don't trigger it or the build side is an intermediate
    * frame the optimizer can't see through.
    */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, key: String,
                      expectedItems: Long = 0L): DataFrame = {
    // Size the sketch to the BUILD side: a fixed 1M-item default builds a
    // ~1.2 MB filter for a few-hundred-row dim, and the scalar ships in
    // EVERY task binary of the big side's scan stage (measured: 2.9 MiB
    // task binaries in bloom_join, the r12 bench's worst offender). One
    // count() on the small side is the cheapest stage of the whole join.
    val items = if (expectedItems > 0) expectedItems
                else math.max(small.count(), 1024L)
    // might_contain requires its sketch to be a constant or scalar
    // subquery (it ships with the task as a literal, not a join input) —
    // Dataset.scalar() plans the 1-row aggregate as exactly that
    val bf = small
      .agg(expr(s"bloom_agg(xxhash64($key), ${items}L)").as("__bf"))
      .scalar()
    big
      .filter(call_function("bloom_might_contain", bf, xxhash64(col(key))))
      .join(small, Seq(key))
  }

  /** Salted two-phase aggregation: partial-aggregate on (key, salt), then
    * final-aggregate on key. Catalyst already plans partial aggregation
    * map-side; the explicit salt matters when a single key's *partial*
    * results still overwhelm one reducer (extreme cardinality skew).
    */
  def saltedCount(df: DataFrame, key: String, salt: Int): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * salt).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
