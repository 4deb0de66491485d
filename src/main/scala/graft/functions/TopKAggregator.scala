package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (survey §2.10): bounded top-k accumulator — keeps the k
  * largest (score, id) pairs per group with a fixed-size buffer, so a
  * per-group top-k costs one aggregation pass (partial top-k map-side,
  * merge of k-element buffers reduce-side) instead of a full sort per
  * group. Ordering: score desc, then id asc — fully deterministic.
  */
case class ScoredId(id: Long, score: Double)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"TopKAggregator: k must be positive, got $k")
  // (k <= 0 would otherwise surface mid-job as b.last on an empty
  // buffer — NoSuchElementException from the first reduce)

  private def keep(xs: Seq[ScoredId]): Seq[ScoredId] =
    xs.sortBy(x => (-x.score, x.id)).take(k)

  private def beats(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredId] = Seq.empty
  // buffer invariant: sorted best-first; the common full-buffer
  // non-qualifying row is an O(1) skip, not a re-sort
  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (b.size < k) keep(b :+ a)
    else if (beats(a, b.last)) keep(b.init :+ a)
    else b
  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    keep(b1 ++ b2)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}
