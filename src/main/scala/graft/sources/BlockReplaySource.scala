package graft.sources

import org.apache.spark.sql.{DataFrame, GraftStreamingShim, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, SerializedOffset, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.operators.EventLog

/** Offset = highest block included so far (inclusive frontier). */
case class BlockOffset(block: Long) extends Offset {
  override def json: String = block.toString
}

object BlockOffset {
  def of(o: Offset): Long = o match {
    case BlockOffset(b) => b
    case other          => other.json.trim.toLong
  }
}

/** Deterministic replay of the events table as a block-ordered streaming
  * source — the test-harness twin of the reference's RPC-backed stream
  * (SURVEY §2.1): each micro-batch covers at most `blockStep` blocks
  * (chunked historical scan, reference: eth_event_stream/src/stream.rs:214-226)
  * and never beyond `head − confirmations` (reorg-safety lag,
  * stream.rs:244-247) nor `toBlock` (bounded ranges, stream.rs:252-254).
  *
  * Scale design: `getBatch` returns the REAL parquet scan filtered to
  * `(start, end]` — predicate pushdown and partition parallelism intact,
  * nothing is collected to the driver. A production chain-tailing variant
  * swaps the parquet DataFrame for an RPC-fetching one; offsets, lag and
  * chunking logic are shared.
  *
  * Options: `path` (required), `blockSize` (event_id → block derivation,
  * default 10), `blockStep` (max blocks/micro-batch, default 1000),
  * `confirmations` (default 2), `fromBlock` (default 0), `toBlock`
  * (default unbounded).
  */
class BlockReplaySource(
    sqlContext: SQLContext,
    parameters: Map[String, String]) extends Source {

  private val path = parameters.getOrElse("path",
    throw new IllegalArgumentException("block-replay requires a `path` option"))
  private val blockSize = parameters.getOrElse("blockSize", "10").toLong
  private val blockStep = parameters.getOrElse("blockStep", "1000").toLong
  private val confirmations = parameters.getOrElse("confirmations", "2").toLong
  private val fromBlock = parameters.getOrElse("fromBlock", "0").toLong
  private val toBlock =
    parameters.get("toBlock").map(_.toLong).getOrElse(Long.MaxValue)
  require(blockStep >= 1, "blockStep must be >= 1")

  private val spark = sqlContext.sparkSession

  /** The events fixture carries TIMESTAMP(NANOS); the legacy nanos-as-long
    * conf must be in effect for EVERY read this source plans (schema, head
    * probe, getBatch), so it is set once at source construction and left
    * on — a session hosting this source opts into nanos-as-long reads.
    * The earlier per-read set/restore raced concurrent queries on the same
    * session during the restore window.
    */
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  private def events: DataFrame =
    EventLog.withBlockKeys(spark.read.parquet(path), blockSize)

  override val schema: StructType = events.schema

  /** Replay "chain head" = max block currently present — re-read on every
    * trigger so the source TAILS a growing table (the BlockNotify head
    * subscription, data_feed/block.rs:17-68). Monotonic guard: a head that
    * moves backwards (uncle/reorg resubmission) is ignored, keeping offsets
    * non-decreasing (stream.rs:236-242).
    */
  private def currentHead(): Long = {
    val h = events.agg(max("block_number")).head() match {
      case r if r.isNullAt(0) => fromBlock - 1 // empty table: nothing synced
      case r                  => r.getLong(0)
    }
    if (h > maxSeenHead) maxSeenHead = h
    maxSeenHead
  }
  private var maxSeenHead: Long = Long.MinValue

  override def getOffset: Option[Offset] = {
    // synced upper bound: head − confirmations, clamped to toBlock; advance
    // at most blockStep blocks per trigger (chunked admission control)
    val endBlock = math.min(currentHead() - confirmations, toBlock)
    val next = math.min(endBlock, lastPlanned + blockStep)
    if (next < fromBlock) None
    else {
      lastPlanned = math.max(lastPlanned, next)
      Some(BlockOffset(lastPlanned))
    }
  }
  private var lastPlanned: Long = fromBlock - 1

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val lo = start.map(BlockOffset.of).getOrElse(fromBlock - 1)
    val hi = BlockOffset.of(end)
    // restart resync: on recovery the engine replays getBatch with the
    // checkpointed offsets BEFORE any getOffset call — adopt them so a new
    // source instance never plans below the committed frontier (offset
    // regression would re-emit committed blocks and break exactly-once)
    if (hi > lastPlanned) lastPlanned = hi
    // reorg guard: a removed=true log in the batch aborts the stream — the
    // reference's invariant (stream.rs:174-181); no-op without the column
    val batch = EventLog.assertNoRemoved(events.filter(
      col("block_number") > lo && col("block_number") <= hi))
    GraftStreamingShim.streamingDataFrame(
      spark, batch.queryExecution.toRdd, batch.schema)
  }

  override def stop(): Unit = ()
}

/** `spark.readStream.format("block-replay")` registration. */
class BlockReplayProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "block-replay"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), new BlockReplaySource(sqlContext, parameters).schema)

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new BlockReplaySource(sqlContext, parameters)
}
