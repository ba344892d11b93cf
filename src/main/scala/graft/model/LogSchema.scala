package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The canonical raw-log relational schema (SURVEY §1.2 / FIXTURES §1.2):
  * topics as four nullable columns `topic0..topic3` — simpler pushdown and
  * SQL parity than an array — with array-form views for fidelity with the
  * reference's `topics: Vec<H256>` (eth_event_stream/src/stream.rs:10).
  */
object LogSchema {

  val struct: StructType = StructType(Seq(
    StructField("address", BinaryType, nullable = false),
    StructField("topic0", BinaryType, nullable = true),
    StructField("topic1", BinaryType, nullable = true),
    StructField("topic2", BinaryType, nullable = true),
    StructField("topic3", BinaryType, nullable = true),
    StructField("data", BinaryType, nullable = true),
    StructField("block_number", LongType, nullable = false),
    StructField("transaction_hash", BinaryType, nullable = true),
    StructField("log_index", LongType, nullable = false),
    StructField("removed", BooleanType, nullable = true)))

  val topicCols: Seq[String] = Seq("topic0", "topic1", "topic2", "topic3")

  /** Column view: `topics` array with TRAILING nulls dropped (a log
    * carries 0–4 topics). Interior null gaps — malformed logs — keep their
    * positions so the view round-trips; dropping them would silently shift
    * later topics down an index.
    */
  def topicsArray: Column = {
    val Seq(t0, t1, t2, t3) = topicCols.map(col)
    when(t3.isNotNull, array(t0, t1, t2, t3))
      .when(t2.isNotNull, array(t0, t1, t2))
      .when(t1.isNotNull, array(t0, t1))
      .when(t0.isNotNull, array(t0))
      .otherwise(array().cast(ArrayType(BinaryType)))
  }

  /** Add the array-form `topics` column. */
  def withTopicsArray(df: DataFrame): DataFrame =
    df.withColumn("topics", topicsArray)

  /** Inverse: split an array-form `topics` column into topic0..topic3
    * (try_element_at: a log carries 0–4 topics, absent → null).
    */
  def fromTopicsArray(df: DataFrame, topicsCol: String = "topics"): DataFrame =
    topicCols.zipWithIndex.foldLeft(df) { case (acc, (name, i)) =>
      acc.withColumn(name, try_element_at(col(topicsCol), lit(i + 1)))
    }
}
