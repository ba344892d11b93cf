package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.model.Hex

/** The LIVE transport seam — the reference speaks `eth_getLogs` over
  * HTTP with retries (`eth_event_stream/src/stream.rs:159-183`) and
  * watches the head (`data_feed/block.rs:17-68`); this is that surface
  * re-expressed as a DataSource V2 over a pluggable [[JsonRpcTransport]]:
  *
  *  - the TRANSPORT is one `String => String` call (request body in,
  *    response body out), `Serializable` so per-range fetches run
  *    EXECUTOR-SIDE — a historical backfill fans the `eth_getLogs`
  *    range chunks across the cluster instead of trickling through the
  *    driver;
  *  - the CODEC ([[EthJsonRpc]]) is pure: builds `eth_getLogs` /
  *    `eth_blockNumber` requests (server-side address/topic0 filters —
  *    the S2 pushdown moved to the node) and parses responses into raw
  *    log rows with the engine's standard schema, so everything
  *    downstream (`withBlockKeys` is unnecessary — real block numbers
  *    ride along — decode, reorg guard) is shared with the replay path;
  *  - the STREAM reuses the replay source's offset/admission mechanics:
  *    `BlockOffset` frontier, `blockStep` chunked admission,
  *    `confirmations` lag, `toBlock` clamp, monotonic head guard,
  *    `Trigger.AvailableNow` drain — checkpoint-compatible semantics,
  *    different byte source.
  *
  * The sandbox has no network, so the HTTP transport is exercised at the
  * request/URL level only; everything from the codec up runs end-to-end
  * in tests against [[graft.FakeEthNode]]-style canned transports.
  */
trait JsonRpcTransport extends Serializable {
  /** POST one JSON-RPC request body, return the response body. Failures
    * throw; callers wrap with [[Retry.withBackoff]] (B3 parity).
    */
  def call(requestJson: String): String
}

/** Real HTTP POST transport (java.net.http, JDK-native — no new deps).
  * Serializable by construction: only the URL and timeouts travel; the
  * client is rebuilt lazily per JVM.
  */
final class HttpJsonRpcTransport(url: String,
    connectTimeoutMs: Long = 5000L, requestTimeoutMs: Long = 30000L)
    extends JsonRpcTransport {
  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs)).build()

  override def call(requestJson: String): String = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(requestJson))
      .build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"JSON-RPC HTTP ${resp.statusCode()} from $url")
    resp.body()
  }
}

/** One parsed `eth_getLogs` entry in the engine's raw-log shape. */
final case class EthLog(
    address: Array[Byte], topics: Seq[Array[Byte]], data: Array[Byte],
    blockNumber: Long, logIndex: Long, transactionHash: Array[Byte],
    removed: Boolean)

/** Pure JSON-RPC codec for the two calls the reference makes. Jackson is
  * already on Spark's classpath; no new dependencies.
  */
object EthJsonRpc {
  private val mapper = new ObjectMapper()

  private def quantity(v: Long): String = "0x" + java.lang.Long.toHexString(v)

  /** Hex quantity → long ("0x" optional, per spec always present). */
  def parseQuantityHex(s: String): Long =
    java.lang.Long.parseLong(Hex.strip0x(s), 16)

  /** `eth_getLogs` request for `[fromBlock, toBlock]` (inclusive, like
    * the RPC spec) with optional server-side address / topic0 filters —
    * the reference builds exactly this filter from its registered
    * streams (stream.rs:152-158).
    */
  def getLogsRequest(id: Long, fromBlock: Long, toBlock: Long,
      address: Option[String] = None, topic0: Option[String] = None): String = {
    val root = mapper.createObjectNode()
    root.put("jsonrpc", "2.0").put("id", id).put("method", "eth_getLogs")
    val filter = mapper.createObjectNode()
    filter.put("fromBlock", quantity(fromBlock))
    filter.put("toBlock", quantity(toBlock))
    address.foreach(filter.put("address", _))
    topic0.foreach { t =>
      val topics = mapper.createArrayNode(); topics.add(t)
      filter.set[ObjectNode]("topics", topics)
    }
    val params = mapper.createArrayNode(); params.add(filter)
    root.set[ObjectNode]("params", params)
    mapper.writeValueAsString(root)
  }

  def blockNumberRequest(id: Long): String = {
    val root = mapper.createObjectNode()
    root.put("jsonrpc", "2.0").put("id", id).put("method", "eth_blockNumber")
    root.set[ObjectNode]("params", mapper.createArrayNode())
    mapper.writeValueAsString(root)
  }

  /** Result node, or a loud error for the JSON-RPC error envelope (the
    * retry wrapper treats it as transient, like the reference's
    * `retry(..)` around every call, stream.rs:159-166).
    */
  private def result(responseJson: String): JsonNode = {
    val root = mapper.readTree(responseJson)
    val err = root.get("error")
    if (err != null && !err.isNull)
      throw new java.io.IOException("JSON-RPC error " +
        s"${err.path("code").asInt()}: ${err.path("message").asText()}")
    val res = root.get("result")
    if (res == null) throw new java.io.IOException(
      s"JSON-RPC response has no result: $responseJson")
    res
  }

  def parseBlockNumber(responseJson: String): Long =
    parseQuantityHex(result(responseJson).asText())

  /** Parse an `eth_getLogs` response. Pending-log entries (null
    * blockNumber/logIndex per spec) are rejected — this engine ingests
    * only mined logs, like the reference's confirmed ranges.
    */
  def parseLogs(responseJson: String): Seq[EthLog] = {
    val res = result(responseJson)
    require(res.isArray, s"eth_getLogs result must be an array, got $res")
    res.asInstanceOf[ArrayNode].elements().asScala.map { n =>
      def hexField(name: String): Array[Byte] = Hex.decode(n.path(name).asText())
      val bn = n.path("blockNumber")
      val li = n.path("logIndex")
      require(!bn.isMissingNode && !bn.isNull && !li.isMissingNode && !li.isNull,
        s"pending log entry (null blockNumber/logIndex): $n")
      EthLog(
        address = hexField("address"),
        topics = n.path("topics").elements().asScala
          .map(t => Hex.decode(t.asText())).toSeq,
        data = hexField("data"),
        blockNumber = parseQuantityHex(bn.asText()),
        logIndex = parseQuantityHex(li.asText()),
        transactionHash = hexField("transactionHash"),
        removed = n.path("removed").asBoolean(false))
    }.toSeq
  }
}

/** Head discovery over the transport (`eth_blockNumber` polling — the
  * pull twin of the reference's WebSocket head subscription,
  * data_feed/block.rs:17-68) with the same monotonic guard as the
  * replay source: a head that moves backwards (uncle resubmission) is
  * ignored so offsets never regress (stream.rs:236-242).
  */
final class RpcHeadTracker(transport: JsonRpcTransport) {
  private var maxSeen = Long.MinValue
  def currentHead(): Option[Long] = {
    val h = Retry.withBackoff()(() =>
      EthJsonRpc.parseBlockNumber(
        transport.call(EthJsonRpc.blockNumberRequest(1L))))
    if (h > maxSeen) maxSeen = h
    if (maxSeen == Long.MinValue) None else Some(maxSeen)
  }
}

object RpcLogSource {
  /** The engine's raw-log schema (FIXTURES.md §1.2): what
    * [[graft.operators.EventDecoder.decode]] consumes directly. Topics
    * are split to fixed columns (`topic1..3` null when absent).
    */
  val LogSchema: StructType = StructType(Seq(
    StructField("address", BinaryType),
    StructField("topic0", BinaryType),
    StructField("topic1", BinaryType),
    StructField("topic2", BinaryType),
    StructField("topic3", BinaryType),
    StructField("data", BinaryType),
    StructField("block_number", LongType, nullable = false),
    StructField("transaction_hash", BinaryType),
    StructField("log_index", LongType, nullable = false),
    StructField("removed", BooleanType, nullable = false)))

  private[sources] def toRow(l: EthLog): InternalRow = {
    def topic(i: Int): Array[Byte] =
      if (i < l.topics.size) l.topics(i) else null
    new GenericInternalRow(Array[Any](
      l.address, topic(0), topic(1), topic(2), topic(3), l.data,
      l.blockNumber, l.transactionHash, l.logIndex, l.removed))
  }

  /** Driver-side registry for non-URL transports (DSv2 options carry
    * only strings): tests and embedders register a transport under a
    * name and pass `transport=<name>`. Consulted at PLANNING time; the
    * instance itself is serialized to executors with the reader factory.
    */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, JsonRpcTransport]()
  def registerTransport(name: String, t: JsonRpcTransport): Unit =
    registry.put(name, t)
  private[sources] def transportFor(o: collection.Map[String, String]): JsonRpcTransport =
    o.get("url").map(new HttpJsonRpcTransport(_)).orElse(
      o.get("transport").map { n =>
        val t = registry.get(n)
        require(t != null, s"no registered transport named '$n' " +
          "(RpcLogSource.registerTransport)")
        t
      }).getOrElse(throw new IllegalArgumentException(
        "rpc-logs requires a `url` or registered `transport` option"))
}

private[sources] final case class RpcParams(
    transport: JsonRpcTransport,
    blockStep: Long, confirmations: Long, fromBlock: Long, toBlock: Long,
    fetchBlocks: Long, address: Option[String], topic0: Option[String]) {
  require(blockStep >= 1, "blockStep must be >= 1")
  require(fetchBlocks >= 1, "fetchBlocks must be >= 1")
}

private[sources] object RpcParams {
  def apply(options: JMap[String, String]): RpcParams = {
    val o = options.asScala
    RpcParams(
      transport = RpcLogSource.transportFor(o),
      blockStep = o.getOrElse("blockstep", o.getOrElse("blockStep", "1000")).toLong,
      confirmations = o.getOrElse("confirmations", "2").toLong,
      fromBlock = o.getOrElse("fromblock", o.getOrElse("fromBlock", "0")).toLong,
      toBlock = o.get("toblock").orElse(o.get("toBlock")).map(_.toLong)
        .getOrElse(Long.MaxValue),
      // executor-side fetch granularity: one eth_getLogs call per
      // partition — the reference's block_step chunking
      // (stream.rs:214-226) mapped onto task parallelism
      fetchBlocks = o.getOrElse("fetchblocks", o.getOrElse("fetchBlocks", "100")).toLong,
      address = o.get("address"),
      topic0 = o.get("topic0"))
  }
}

/** One inclusive block range fetched by one task. */
private[sources] final case class RpcRangePartition(from: Long, to: Long)
    extends InputPartition

/** Executor-side fetch: ONE `eth_getLogs` per partition, retried with
  * backoff (B3), parsed rows streamed out. The transport travels inside
  * this factory (Serializable).
  */
private[sources] final class RpcRangeReaderFactory(
    transport: JsonRpcTransport, address: Option[String],
    topic0: Option[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val range = p.asInstanceOf[RpcRangePartition]
    new PartitionReader[InternalRow] {
      private var it: Iterator[InternalRow] = _
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (it == null) {
          val logs = Retry.withBackoff()(() =>
            EthJsonRpc.parseLogs(transport.call(EthJsonRpc.getLogsRequest(
              1L, range.from, range.to, address, topic0))))
          it = logs.iterator.map(RpcLogSource.toRow)
        }
        if (it.hasNext) { current = it.next(); true } else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** Shared range → partitions split (`fetchBlocks` granularity). */
private[sources] object RpcRanges {
  def partitions(lo: Long, hi: Long, fetchBlocks: Long): Array[InputPartition] =
    (lo to hi by fetchBlocks).map(a =>
      RpcRangePartition(a, math.min(a + fetchBlocks - 1, hi)): InputPartition)
      .toArray
}

/** Streaming side: the replay source's offset/admission mechanics over
  * the RPC transport. Offsets are the same inclusive `BlockOffset`
  * frontier, so checkpoints restart-resync structurally (S7).
  */
private[sources] class RpcLogStream(params: RpcParams)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  import params._

  private val head = new RpcHeadTracker(transport)
  private def syncedEnd(): Long =
    head.currentHead().map(h => math.min(h - confirmations, toBlock))
      .getOrElse(fromBlock - 1)

  private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(syncedEnd())

  override def initialOffset(): Offset = BlockOffset(fromBlock - 1)
  override def deserializeOffset(json: String): Offset =
    BlockOffset(json.trim.toLong)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "rpc-logs implements SupportsAdmissionControl; the engine calls latestOffset(start, limit)")

  private def blockBudget(limit: ReadLimit): Long = limit match {
    // blocks are this source's admission unit, like the replay source
    case f: ReadMaxFiles => math.min(math.max(1L, f.maxFiles().toLong), blockStep)
    case _ => blockStep
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = BlockOffset.of(start)
    val target = availableNowTarget.getOrElse(syncedEnd())
    val end = math.max(from, math.min(target, from + blockBudget(limit)))
    if (end == from) start else BlockOffset(end)
  }

  override def reportLatestOffset(): Offset =
    BlockOffset(math.max(syncedEnd(), fromBlock - 1))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    RpcRanges.partitions(BlockOffset.of(start) + 1, BlockOffset.of(end), fetchBlocks)

  override def createReaderFactory(): PartitionReaderFactory =
    new RpcRangeReaderFactory(transport, address, topic0)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Batch side: the historical chunked scan (S3) over RPC — the full
  * `[fromBlock, min(head − confirmations, toBlock)]` range split into
  * `fetchBlocks` partitions, fetched executor-side in parallel.
  */
private[sources] class RpcLogBatch(params: RpcParams) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val head = new RpcHeadTracker(params.transport)
    val hi = head.currentHead()
      .map(h => math.min(h - params.confirmations, params.toBlock))
      .getOrElse(params.fromBlock - 1)
    RpcRanges.partitions(params.fromBlock, hi, params.fetchBlocks)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RpcRangeReaderFactory(params.transport, params.address, params.topic0)
}

private[sources] class RpcLogScan(params: RpcParams) extends Scan {
  override def readSchema(): StructType = RpcLogSource.LogSchema
  override def description(): String = "rpc-logs"
  override def toBatch: Batch = new RpcLogBatch(params)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RpcLogStream(params)
}

private[sources] class RpcLogTable(params: RpcParams)
    extends Table with SupportsRead {
  override def name(): String = "rpc-logs"
  override def schema(): StructType = RpcLogSource.LogSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new RpcLogScan(params)
}

/** `spark.read/readStream.format("graft.sources.RpcLogProvider")`.
  *
  * Options: `url` (HTTP endpoint) OR `transport` (registered name);
  * `blockStep` (max blocks per micro-batch, default 1000);
  * `fetchBlocks` (blocks per eth_getLogs call/partition, default 100);
  * `confirmations` (default 2); `fromBlock`/`toBlock`; optional
  * `address`/`topic0` server-side filters.
  */
class RpcLogProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "rpc-logs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RpcLogSource.LogSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new RpcLogTable(RpcParams(properties))
}

/** Deterministic in-memory JSON-RPC node — the RPC twin of the parquet
  * replay harness (the sandbox has no network, so this SIMULATED node is
  * what drives the transport path end-to-end; swap in
  * [[HttpJsonRpcTransport]] against a real endpoint and nothing else
  * changes). Serves `eth_blockNumber` and `eth_getLogs` from a pure
  * function of the block range, so results are restatable relationally
  * (the correctness oracle) and identical on every call — a copy
  * travels to each task inside the reader factory, exactly like a real
  * URL transport.
  *
  * Log model: `logsPerBlock` logs per block; log `i` of block `b` comes
  * from contract 0xaa…aa (even i) or 0xbb…bb (odd i), topic0 0xcc…cc,
  * data = the 32-byte word of `b*1000 + i`; blocks in `removedBlocks`
  * serve `removed: true` (reorg-guard drills). `headSequence` pre-seeds
  * successive `eth_blockNumber` answers (head-regression drills), then
  * the fixed `head` serves forever.
  */
final class SimEthNode(head: Long, logsPerBlock: Int,
    removedBlocks: Set[Long] = Set.empty,
    headSequence: Seq[Long] = Nil) extends JsonRpcTransport {
  private val heads = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]
  headSequence.foreach(h => heads.add(h))

  private def hexQty(v: Long): String = "0x" + java.lang.Long.toHexString(v)

  override def call(requestJson: String): String = {
    val m = new ObjectMapper()
    val req = m.readTree(requestJson)
    req.path("method").asText() match {
      case "eth_blockNumber" =>
        val h = Option(heads.poll()).map(_.longValue).getOrElse(head)
        s"""{"jsonrpc":"2.0","id":1,"result":"${hexQty(h)}"}"""
      case "eth_getLogs" =>
        val f = req.path("params").get(0)
        val from = EthJsonRpc.parseQuantityHex(f.path("fromBlock").asText())
        val to = EthJsonRpc.parseQuantityHex(f.path("toBlock").asText())
        val address = Option(f.get("address")).map(_.asText())
        val logs = (from to to).flatMap { b =>
          (0 until logsPerBlock).map { i =>
            val addr = if (i % 2 == 0) "0x" + "aa" * 20 else "0x" + "bb" * 20
            (b, i, addr)
          }
        }.filter { case (_, _, a) => address.forall(_ == a) }
          .map { case (b, i, addr) =>
            val data = "0x" + ("%064x".format(b * 1000 + i))
            val tx = "0x" + ("%064x".format(b))
            s"""{"address":"$addr","topics":["0x${"cc" * 32}"],""" +
              s""""data":"$data","blockNumber":"${hexQty(b)}",""" +
              s""""logIndex":"${hexQty(i.toLong)}","transactionHash":"$tx",""" +
              s""""removed":${removedBlocks.contains(b)}}"""
          }
        s"""{"jsonrpc":"2.0","id":1,"result":[${logs.mkString(",")}]}"""
      case other =>
        s"""{"jsonrpc":"2.0","id":1,"error":{"code":-32601,"message":"method $other not found"}}"""
    }
  }
}
