package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed exact top-k aggregator (SURVEY.md §2.9's custom-aggregate surface,
  * the [EXT] piece §7.2 deferred): keeps the k best (score, id) pairs per
  * group in a bounded buffer.
  *
  * vs the window formulation (`row_number().over(...) <= k`): the window
  * sorts every row of every group (full shuffle + per-group sort), while
  * this aggregator carries at most k elements per partial buffer and
  * merges map-side — the right trade at 100 TB when k ≪ group size.
  * Deterministic: ties broken by ascending id, like the window's tiebreak.
  *
  * Buffer/output are Seq[(Double, Long)] with product encoders — columnar,
  * no kryo blobs.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (score, id) => (-score, id) } // best first, ties by id

  private def bound(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.sorted(ord).take(k)

  override def zero: Seq[(Double, Long)] = Nil
  // invariant: every buffer this class produces is sorted best-first and
  // ≤ k long (zero/bound), so b.last is the current k-th best. Once the
  // buffer is full, a row that does not beat it is rejected with ONE
  // comparison instead of re-sorting the buffer per row (r16: the common
  // case at corpus scale — most scored rows never enter the top-k).
  // (score, id) pairs are distinct within a group (ids unique), so the
  // gteq rejection can never drop a row that the sort would have kept.
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    if (b.size >= k && ord.gteq(a, b.last)) b else bound(b :+ a)
  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    bound(x ++ y)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoderHelper.seqTupleEncoder
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoderHelper.seqTupleEncoder
}

private[functions] object ExpressionEncoderHelper {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val seqTupleEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder[Seq[(Double, Long)]]()
}
