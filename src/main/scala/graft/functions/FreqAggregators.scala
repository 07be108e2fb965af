package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed frequency-weighted aggregators — the direct Spark mapping of the
  * reference's AggregateFunction trait
  * (/root/reference/src/functions/src/lib.rs:117-159):
  *
  *   state_size/initialize → `zero`
  *   apply(args, freq, state) → `reduce` (freq multiplies the update;
  *     negative freq retracts — the moving-aggregate design of
  *     lib.rs:152-158)
  *   merge(state, state) → `merge` (partial aggregation)
  *   finalize → `finish`
  *
  * Usable as a `TypedColumn` over Dataset[(value, freq)] pairs or via
  * `.toColumn` in untyped agg — one Aggregator per retractable aggregate
  * family (sum/count/avg share the (sum, count) buffer, as the
  * reference's avg does in aggregate/maths/avg.rs:12-160).
  */
object FreqAggregators {

  /** Buffer: exact long-scaled sum (cents) + signed count. */
  final case class AvgBuf(var sumCents: Long, var count: Long)

  /** Frequency-weighted average over (value, freq) with retraction:
    * values are scaled to 2 decimal places internally so partial merges
    * stay exact and order-independent (same rationale as the decimal
    * oracle contract in QueryDef). */
  object freqAvg extends Aggregator[(Double, Long), AvgBuf, Option[Double]] {
    override def zero: AvgBuf = AvgBuf(0L, 0L)
    override def reduce(b: AvgBuf, in: (Double, Long)): AvgBuf = {
      val (v, freq) = in
      b.sumCents += math.round(v * 100.0) * freq
      b.count += freq
      b
    }
    override def merge(a: AvgBuf, b: AvgBuf): AvgBuf =
      AvgBuf(a.sumCents + b.sumCents, a.count + b.count)
    override def finish(b: AvgBuf): Option[Double] =
      if (b.count == 0) None else Some(b.sumCents / 100.0 / b.count)
    override def bufferEncoder: Encoder[AvgBuf] = Encoders.product[AvgBuf]
    override def outputEncoder: Encoder[Option[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Frequency-weighted count with retraction (count.rs:8-53). */
  object freqCount extends Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, freq: Long): Long = b + freq
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(b: Long): Long = b
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
