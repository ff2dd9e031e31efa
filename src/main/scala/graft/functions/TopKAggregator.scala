package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.10): bounded top-k of (key, score) pairs.
  *
  * The buffer is a k-element min-heap, so partial aggregation ships at most
  * k pairs per partition across the shuffle — the map-side-combinable way
  * to take a global top-k of something `TakeOrderedAndProject` can't see
  * (e.g. top-k *after* a per-key aggregation inside one pass, or top-k per
  * group via groupBy().agg(topK.toColumn)).
  *
  * Register: `spark.udf.register("top_k", functions.udaf(new TopKAggregator(10)))`
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  override def zero: Seq[(Long, Double)] = Vector.empty

  private def trim(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
    // keep the k best; deterministic tie-break on key
    xs.sortBy { case (id, score) => (-score, id) }.take(k)

  override def reduce(buf: Seq[(Long, Double)],
                      a: (Long, Double)): Seq[(Long, Double)] = {
    // the fast-path rejection must use the FULL (-score, id) ordering:
    // rejecting on score alone drops equal-score/lower-id elements that
    // trim would keep, making results depend on partitioning
    def beats(x: (Long, Double), y: (Long, Double)): Boolean =
      x._2 > y._2 || (x._2 == y._2 && x._1 < y._1)
    if (buf.size < k || beats(a, buf.last)) trim(buf :+ a) else buf
  }

  override def merge(b1: Seq[(Long, Double)],
                     b2: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(b1 ++ b2)

  override def finish(reduction: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(reduction)

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
