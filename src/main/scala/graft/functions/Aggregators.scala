package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregation surface (SURVEY §2.2 UDF/UDAF row): custom
  * `Aggregator[IN, BUF, OUT]`s usable from `Dataset.groupByKey(...).agg`
  * and registerable as SQL UDAFs via `functions.udaf`.
  */
object Aggregators {

  /** Bounded-state top-k per group: keeps only the k largest
    * (score, id) pairs in a min-heap buffer, merged map-side — so a
    * per-key top-k costs O(k) state instead of a full window
    * sort-shuffle. Output is sorted descending by (score, then id desc)
    * with ties broken deterministically. The scale answer to
    * "row_number() <= k" when k << group size.
    */
  final class TopK(k: Int) extends Aggregator[(Double, Long), mutable.PriorityQueue[(Double, Long)], Seq[(Double, Long)]] {

    // min-heap: smallest retained element at head (reverse of natural
    // descending ordering)
    private def heapOrd: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long.reverse)

    override def zero: mutable.PriorityQueue[(Double, Long)] =
      mutable.PriorityQueue.empty(heapOrd)

    override def reduce(
        b: mutable.PriorityQueue[(Double, Long)],
        a: (Double, Long)): mutable.PriorityQueue[(Double, Long)] = {
      b.enqueue(a)
      while (b.size > k) b.dequeue()
      b
    }

    override def merge(
        b1: mutable.PriorityQueue[(Double, Long)],
        b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
      b2.foreach(b1.enqueue(_))
      while (b1.size > k) b1.dequeue()
      b1
    }

    override def finish(b: mutable.PriorityQueue[(Double, Long)]): Seq[(Double, Long)] =
      b.toSeq.sortBy { case (s, i) => (-s, i) }

    override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
      Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }
}
