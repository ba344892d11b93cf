package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between custom Catalyst `Expression`s and the public `Column`
  * API. `classic.ExpressionUtils` is `private[sql]`, so the bridge lives in
  * the `org.apache.spark.sql` package — the established pattern for
  * libraries shipping native expressions.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** Registers a temp SQL function on a LIVE session (`sessionState` is
  * `private[sql]`); the extensions path covers sessions created with
  * `spark.sql.extensions`.
  */
object GraftFunctionShim {
  def register(
      spark: SparkSession,
      name: String,
      builder: Seq[catalyst.expressions.Expression] => catalyst.expressions.Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}

/** Streaming-side bridge: a V1 `Source.getBatch` must return a DataFrame
  * whose plan is flagged `isStreaming` — only constructible through the
  * `private[sql]` `internalCreateDataFrame` (the pattern every classic
  * custom V1 source used).
  */
object GraftStreamingShim {
  def streamingDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
