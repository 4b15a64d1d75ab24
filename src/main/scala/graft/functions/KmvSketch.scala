package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (KMV) distinct sketch (Bar-Yossef et al., "Counting
  * distinct elements in a data stream"): keep the k smallest DISTINCT
  * hash values of a key stream; the k-th smallest value v_k of a uniform
  * 32-bit hash estimates the cardinality as (k-1) * 2^32 / v_k, and if
  * fewer than k distinct hashes exist the sketch IS the distinct set.
  *
  * Why this sketch next to HLL (`approxDistinctWithinTol`) and CMS
  * (`heavyHittersCms`): KMV sketches COMPOSE under set algebra — the
  * union of two sketches is the k smallest of their merged value sets,
  * and the fraction of the union sketch present in both sides estimates
  * the intersection (`RelationalOps.kmvJoinEstimate`). That makes it the
  * join-size-estimation primitive a cost-based planner wants: land one
  * KMV per (table, join column) at stats time, and any pairwise overlap
  * — i.e. any equi-join's distinct-key selectivity — is estimable from
  * two k-row artifacts without touching the tables again. HLL gives
  * cheaper unions but no principled intersection; KMV gives both.
  *
  * Scale shape: the buffer is a bounded sorted Seq (≤ k values), merged
  * map-side — at any corpus size a partial aggregate carries k longs,
  * never the key set. The input hash is the repo's portable 32-bit
  * md5-prefix, so a DuckDB oracle replays the sketch VALUES bit-exactly
  * (window rank over distinct hashes) — the estimate is gated as exact
  * integer arithmetic, not a weaker within-tolerance boolean.
  *
  * Determinism: the sketch is a pure function of the distinct input set
  * (insertion-order-free, partitioning-free); reduce dedups via binary
  * search on the sorted buffer, so a hot key costs O(log k), not a
  * re-sort.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], a: Long): Seq[Long] = {
    // quick reject: buffer full and a beyond the current k-th min
    if (b.length >= k && a >= b.last) b
    else {
      val i = b.search(a)(Ordering.Long) match {
        case scala.collection.Searching.Found(_)            => return b // already present
        case scala.collection.Searching.InsertionPoint(idx) => idx
      }
      val inserted = (b.take(i) :+ a) ++ b.drop(i)
      if (inserted.length > k) inserted.take(k) else inserted
    }
  }

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    // both sides sorted-distinct; fold the smaller into the larger
    if (x.length >= y.length) y.foldLeft(x)(reduce) else x.foldLeft(y)(reduce)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] = KmvAggregator.seqLongEncoder
  override def outputEncoder: Encoder[Seq[Long]] = KmvAggregator.seqLongEncoder
}

object KmvAggregator {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  private[functions] val seqLongEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  /** Untyped column form for `groupBy(...).agg(...)` use. */
  def column(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvAggregator(k), Encoders.scalaLong)
}
