package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A1 — the `EventReducer` fold surface as a typed distributed
  * `Aggregator` (SURVEY §2.5): the reference's order-INSENSITIVE reducers
  * (the netflow fold, stream_multi.rs:33-70) are commutative+associative
  * folds, which is exactly Spark's UDAF contract — `reduce` runs map-side
  * per partition, `merge` combines partial buffers across the shuffle, so
  * the fold is partial-aggregated everywhere like a built-in `sum`.
  * Order-SENSITIVE reducers stay on the single-consumer driver path
  * ([[graft.streaming.StreamOps.runOrderedReducer]]) — that contract
  * cannot distribute.
  *
  * The buffer is decimal (38,18 through `Encoders.DECIMAL`), like every
  * other netflow path: a double buffer would read cancelled flows as
  * ±1e-9 instead of exactly 0.
  */
class DecimalSumAggregator
    extends Aggregator[java.math.BigDecimal, java.math.BigDecimal,
      java.math.BigDecimal] {
  override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
  // null inputs contribute nothing, like built-in sum over null rows
  override def reduce(buf: java.math.BigDecimal,
      delta: java.math.BigDecimal): java.math.BigDecimal =
    if (delta == null) buf else buf.add(delta)
  override def merge(a: java.math.BigDecimal,
      b: java.math.BigDecimal): java.math.BigDecimal = a.add(b)
  override def finish(buf: java.math.BigDecimal): java.math.BigDecimal = buf
  override def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
  override def outputEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
}

object Aggregators {
  /** Column form of the decimal-sum fold; input must be decimal(38,18)
    * (cast explicitly — the UDAF deserializes through `Encoders.DECIMAL`).
    * Usable in batch `groupBy().agg(...)` AND streaming aggregation
    * (update/complete mode) — the same partial/merge plan shape as `sum`.
    */
  val decimalSum: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new DecimalSumAggregator, Encoders.DECIMAL)

  def decimalSumOf(c: Column): Column = decimalSum(c)
}
