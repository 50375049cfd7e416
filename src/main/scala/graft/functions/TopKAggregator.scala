package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k by (score desc, id asc) as a typed Aggregator (SURVEY §7:
  * the custom-aggregate tier for similarity search).
  *
  * Why this beats ranking with a window: `row_number().over(partitionBy
  * (query))` shuffles EVERY scored (query, neighbor) row and sorts whole
  * partitions; this aggregator keeps a bounded k-element heap per query
  * per partition (partial aggregation), so only k rows per query per
  * partition cross the shuffle — at a 10⁹-row corpus that is the
  * difference between shuffling 10⁹ rows and shuffling k × partitions.
  */
final case class Scored(neighborId: Long, score: Double)

class TopKAggregator(k: Int)
    extends Aggregator[Scored, mutable.PriorityQueue[Scored], Seq[Scored]] {

  // min-heap: head = current WORST of the kept k (lowest score; ties keep
  // the larger id on top so the smaller id survives eviction)
  private def heapOrdering: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.neighborId))

  override def zero: mutable.PriorityQueue[Scored] =
    mutable.PriorityQueue.empty(heapOrdering)

  override def reduce(buf: mutable.PriorityQueue[Scored], a: Scored): mutable.PriorityQueue[Scored] = {
    buf.enqueue(a)
    while (buf.size > k) buf.dequeue()
    buf
  }

  override def merge(b1: mutable.PriorityQueue[Scored], b2: mutable.PriorityQueue[Scored]): mutable.PriorityQueue[Scored] = {
    b2.foreach(b1.enqueue(_))
    while (b1.size > k) b1.dequeue()
    b1
  }

  /** Best-first: score desc, id asc. */
  override def finish(buf: mutable.PriorityQueue[Scored]): Seq[Scored] =
    buf.toSeq.sortBy(s => (-s.score, s.neighborId))

  override def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
    Encoders.kryo[mutable.PriorityQueue[Scored]]
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
