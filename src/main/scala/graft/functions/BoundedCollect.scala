package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** `collect_list` with a hard cap on the aggregation buffer: accumulates at
  * most `cap + 1` elements per group and stops. A group that overflows the
  * cap finishes with `cap + 1` elements — callers detect overflow with
  * `size(col) > cap` and can drop the group without ever having buffered it.
  *
  * This is the memory-safety primitive behind the ngram-dedup stop-shingle
  * guard: plain `collect_list` buffers a hot shingle's ENTIRE posting list
  * (a boilerplate shingle in a 100 TB corpus is billions of doc ids in one
  * aggregation buffer) before any df filter can run, while this aggregator's
  * per-group state is bounded at `cap + 1` longs no matter the true df.
  */
class BoundedCollectLong(cap: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
  def zero: Seq[Long] = Vector.empty
  def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length <= cap) b :+ a else b
  def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    if (x.length > cap) x
    else (x ++ y).take(cap + 1)
  def finish(b: Seq[Long]): Seq[Long] = b
  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object BoundedCollect {
  /** Column form: `boundedCollect(cap)(col)` — ArrayType(LongType) output,
    * at most `cap + 1` elements, overflow detectable via `size > cap`.
    */
  def boundedCollectLong(cap: Int)(col: Column): Column =
    udaf(new BoundedCollectLong(cap)).apply(col)
}
