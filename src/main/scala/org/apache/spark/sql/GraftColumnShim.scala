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

/** Releases the block-manager storage behind a `localCheckpoint`ed (or
  * `checkpoint`ed) DataFrame. `spark.catalog.clearCache()` does NOT free
  * checkpoint RDDs, and the ContextCleaner only reclaims them after the
  * plan object is garbage-collected — a long-lived session looping over
  * corpora accumulates blocks without bound. The checkpoint RDD sits in a
  * `LogicalRDD` leaf (`private[sql]`, hence this bridge).
  *
  * After the call the DataFrame is UNUSABLE (its lineage was truncated at
  * the checkpoint); only release checkpoints that are fully superseded.
  */
object GraftCheckpointShim {
  def releaseCheckpoint(df: Dataset[Row]): Unit =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed.foreach {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
