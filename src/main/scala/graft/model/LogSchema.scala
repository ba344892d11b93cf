package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The canonical raw-log relational schema (SURVEY §1.2 / FIXTURES §1.2):
  * topics as four nullable columns `topic0..topic3` — simpler pushdown and
  * SQL parity than an array — with array-form views for fidelity with the
  * reference's `topics: Vec<H256>` (eth_event_stream/src/stream.rs:10).
  *
  * == The 32-byte topic contract ==
  *
  * Every non-null `topicN` value MUST be exactly 32 bytes (an EVM word,
  * as the node returns it). Both engine sources construct topics that
  * way, and downstream soundness DEPENDS on it:
  * [[graft.plans.IndexedParamRewrite]] rewrites decoded-param filters
  * into raw-word equality/range predicates that are only equivalent on
  * fixed-width words (a minimal-length `0x07` decodes to 7 but can never
  * match the padded-word equality, and byte-order = numeric-order holds
  * only at fixed width). Parquet written by EXTERNAL tools with
  * minimal-length topic encodings silently violates this — route such
  * data through [[normalizeTopicWords]] (left-pad to the word) or
  * [[assertTopicWords]] (fail fast) on first read.
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

  /** Validation gate for EXTERNALLY sourced log parquet: every non-null
    * topic must be an exactly-32-byte word (see the class contract). A
    * violating row fails the job with its coordinates — per-row, inside
    * codegen, no extra pass or collect. Engine-written data never needs
    * this; it is the fail-fast option for foreign data.
    */
  def assertTopicWords(df: DataFrame): DataFrame =
    topicCols.foldLeft(df) { (acc, t) =>
      acc.withColumn(t,
        when(col(t).isNotNull && octet_length(col(t)) =!= 32,
          raise_error(concat(
            lit(s"LogSchema: $t is not a 32-byte word (len="),
            octet_length(col(t)).cast("string"),
            lit(") at block_number="),
            col("block_number").cast("string"),
            lit(" log_index="), col("log_index").cast("string"))))
          .otherwise(col(t)))
    }

  /** Normalization for foreign log parquet written with MINIMAL-LENGTH
    * big-endian topic encodings: left-pads short non-null topics with
    * zero bytes to the 32-byte word. Values LONGER than a word are
    * corrupt, not minimal encodings — those still fail the job. The
    * unsigned zero-pad is the correct inverse of minimal big-endian
    * encoding; tools that minimally encode NEGATIVE two's-complement
    * words (none known) would need sign-aware padding instead.
    */
  def normalizeTopicWords(df: DataFrame): DataFrame =
    topicCols.foldLeft(df) { (acc, t) =>
      acc.withColumn(t,
        when(col(t).isNull, col(t))
          .when(octet_length(col(t)) > 32,
            raise_error(concat(
              lit(s"LogSchema: $t longer than a 32-byte word (len="),
              octet_length(col(t)).cast("string"),
              lit(") at block_number="),
              col("block_number").cast("string"),
              lit(" log_index="), col("log_index").cast("string"))))
          .otherwise(lpad(col(t), 32, Array[Byte](0))))
    }
}
