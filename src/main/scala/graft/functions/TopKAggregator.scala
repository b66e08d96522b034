package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate flowing into the top-k aggregation. */
case class ScoredNeighbor(neighbor_id: Long, score: Double)

/** Typed bounded-heap top-k aggregator (SURVEY.md §7.3: the designated
  * `Aggregator[IN,BUF,OUT]` candidate). Versus the ranking-window top-k
  * (v01), the win at scale is WHERE the work happens: this is an
  * algebraic aggregate, so each map task reduces its partition to k
  * rows before the shuffle — the exchange carries k rows per group per
  * partition instead of every scored candidate, and no sort runs.
  *
  * Ordering: score descending, neighbor_id ascending on ties — the same
  * total order as the window/oracle formulation, so results are
  * deterministic and oracle-comparable.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredNeighbor, mutable.PriorityQueue[(Double, Long)], Seq[ScoredNeighbor]] {

  // worst-first ordering: PriorityQueue pops its max, so the ordering
  // must rank the worst entry highest — reversed double puts the LOWEST
  // score on top; ascending id as tiebreak makes the larger id worse
  private def heapOrd: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrd)

  private def push(h: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)) = {
    if (h.size < k) h.enqueue(e)
    else if (heapOrd.compare(e, h.head) < 0) { h.dequeue(); h.enqueue(e) }
    h
  }

  override def reduce(h: mutable.PriorityQueue[(Double, Long)], in: ScoredNeighbor) =
    push(h, (in.score, in.neighbor_id))

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]) = {
    b.foreach(e => push(a, e))
    a
  }

  override def finish(h: mutable.PriorityQueue[(Double, Long)]): Seq[ScoredNeighbor] =
    h.toSeq.sortBy { case (s, id) => (-s, id) }
      .map { case (s, id) => ScoredNeighbor(id, s) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredNeighbor]]()
}
