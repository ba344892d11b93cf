package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.abi
import graft.model.Hex
import graft.operators.EventLog
import graft.sources.{EthJsonRpc, JsonRpcTransport, RpcHeadTracker, RpcLogSource, SimEthNode}

class RpcSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = TestSpark.tempDir("graft-rpc")

  test("codec: request shapes match the JSON-RPC wire format") {
    assert(EthJsonRpc.blockNumberRequest(7L) ==
      """{"jsonrpc":"2.0","id":7,"method":"eth_blockNumber","params":[]}""")
    assert(EthJsonRpc.getLogsRequest(1L, 16L, 255L) ==
      """{"jsonrpc":"2.0","id":1,"method":"eth_getLogs","params":""" +
        """[{"fromBlock":"0x10","toBlock":"0xff"}]}""")
    val filtered = EthJsonRpc.getLogsRequest(2L, 0L, 1L,
      address = Some("0x" + "aa" * 20), topic0 = Some("0x" + "cc" * 32))
    assert(filtered.contains(""""address":"0x""" + "aa" * 20 + "\""))
    assert(filtered.contains(""""topics":["0x""" + "cc" * 32 + "\"]"))
  }

  test("codec: parses logs, quantities, removed flag; errors are loud") {
    val resp =
      """{"jsonrpc":"2.0","id":1,"result":[
        {"address":"0x""" + "ab" * 20 + """","topics":["0x""" + "01" * 32 +
        """","0x""" + "02" * 32 + """"],"data":"0x03ff",
         "blockNumber":"0x10","logIndex":"0x2",
         "transactionHash":"0x""" + "0d" * 32 + """","removed":true}]}"""
    val logs = EthJsonRpc.parseLogs(resp)
    assert(logs.size == 1)
    val l = logs.head
    assert(Hex.encode(l.address) == "ab" * 20)
    assert(l.topics.size == 2 && Hex.encode(l.topics(1)) == "02" * 32)
    assert(Hex.encode(l.data) == "03ff")
    assert(l.blockNumber == 16L && l.logIndex == 2L && l.removed)
    // JSON-RPC error envelope → IOException naming code and message
    val err = intercept[java.io.IOException] {
      EthJsonRpc.parseLogs(
        """{"jsonrpc":"2.0","id":1,"error":{"code":-32000,"message":"boom"}}""")
    }
    assert(err.getMessage.contains("-32000") && err.getMessage.contains("boom"))
    // pending entries (null blockNumber) must not silently ingest
    intercept[IllegalArgumentException] {
      EthJsonRpc.parseLogs(
        """{"jsonrpc":"2.0","id":1,"result":[{"address":"0x" ,
           "topics":[],"data":"0x","blockNumber":null,"logIndex":null,
           "transactionHash":"0x","removed":false}]}""")
    }
  }

  test("head tracker: monotonic guard ignores a regressing head; retries transient failures") {
    val node = new SimEthNode(head = 12L, logsPerBlock = 1,
      headSequence = Seq(10L, 8L))
    val tracker = new RpcHeadTracker(node)
    assert(tracker.currentHead().contains(10L))
    assert(tracker.currentHead().contains(10L), "head 8 must not regress the guard")
    assert(tracker.currentHead().contains(12L))

    val flaky = new JsonRpcTransport {
      var calls = 0
      override def call(requestJson: String): String = {
        calls += 1
        if (calls <= 2) throw new java.io.IOException(s"transient $calls")
        new SimEthNode(9L, 1).call(requestJson)
      }
    }
    assert(new RpcHeadTracker(flaky).currentHead().contains(9L))
    val dead = new JsonRpcTransport {
      override def call(requestJson: String): String =
        throw new java.io.IOException("down")
    }
    val e = intercept[java.io.IOException] {
      new RpcHeadTracker(dead).currentHead()
    }
    assert(e.getMessage == "down")
  }

  test("streaming RPC source: confirmations, chunked admission, decodable payloads") {
    RpcLogSource.registerTransport("fake_stream",
      new SimEthNode(head = 40L, logsPerBlock = 3))
    val stream = spark.readStream.format("graft.sources.RpcLogProvider")
      .option("transport", "fake_stream")
      .option("blockStep", "10").option("fetchBlocks", "7")
      .option("confirmations", "2").load()
    val q = EventLog.assertNoRemoved(stream)
      .writeStream.format("memory").queryName("rpc_stream")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmp()).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("rpc_stream")
    // head 40 − 2 confirmations ⇒ blocks 0..38 inclusive, 3 logs each
    assert(got.count() == 39L * 3)
    assert(got.agg(max("block_number")).head().getLong(0) == 38L)
    // chunked admission: ≥ range/blockStep micro-batches planned
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
    // payloads decode through the standard ABI kernels: word = b*1000+i
    val bad = got.select($"block_number", $"log_index",
        abi.u256($"data").cast("long").as("v"))
      .filter($"v" =!= $"block_number" * 1000 + $"log_index").count()
    assert(bad == 0L)
    // topics split to fixed columns; only topic0 present in the fixture
    assert(got.filter($"topic0".isNull).count() == 0L)
    assert(got.filter($"topic1".isNotNull).count() == 0L)
  }

  test("server-side address filter reaches the node (S2 pushdown over RPC)") {
    RpcLogSource.registerTransport("fake_addr",
      new SimEthNode(head = 20L, logsPerBlock = 2))
    val got = spark.read.format("graft.sources.RpcLogProvider")
      .option("transport", "fake_addr").option("confirmations", "0")
      .option("address", "0x" + "aa" * 20).load()
    // only even log indexes live at 0xaa…aa
    assert(got.count() == 21L)
    assert(got.filter($"log_index" =!= 0).count() == 0L)
    assert(got.select(lower(hex($"address"))).distinct()
      .as[String].collect().toSeq == Seq("aa" * 20))
  }

  test("batch RPC scan equals the drained stream (same transport, same range)") {
    RpcLogSource.registerTransport("fake_batch",
      new SimEthNode(head = 25L, logsPerBlock = 2))
    val batch = spark.read.format("graft.sources.RpcLogProvider")
      .option("transport", "fake_batch").option("confirmations", "2")
      .option("fetchBlocks", "6").load()
      .select($"block_number", $"log_index").as[(Long, Long)]
      .collect().toSet
    val stream = spark.readStream.format("graft.sources.RpcLogProvider")
      .option("transport", "fake_batch").option("confirmations", "2")
      .option("blockStep", "9").load()
    val q = stream.writeStream.format("memory").queryName("rpc_batch_twin")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmp()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("rpc_batch_twin")
      .select($"block_number", $"log_index").as[(Long, Long)]
      .collect().toSet
    assert(batch == streamed && batch.nonEmpty)
  }

  test("removed log over RPC aborts the stream (reorg guard, stream.rs:174-181)") {
    RpcLogSource.registerTransport("fake_removed",
      new SimEthNode(head = 10L, logsPerBlock = 1, removedBlocks = Set(5L)))
    val stream = spark.readStream.format("graft.sources.RpcLogProvider")
      .option("transport", "fake_removed").option("confirmations", "0").load()
    val q = EventLog.assertNoRemoved(stream)
      .writeStream.format("noop")
      .option("checkpointLocation", tmp()).start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    val messages = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("removed (reorged) log"))
  }

  test("flagship over the wire: RPC stream → topic0 filter → ABI decode → netflow") {
    // a node serving REAL Transfer logs: topic0 = the keccak signature,
    // topics 1/2 = from/to address words, data = the value word — the
    // stream_multi flagship (stream_multi.rs:33-70) with the transport
    // swapped from parquet replay to JSON-RPC
    val schema = graft.model.EventSchema.parse(
      "Transfer(address indexed from, address indexed to, uint value)")
    final class TransferNode(head: Long) extends JsonRpcTransport {
      private def hexQty(v: Long): String = "0x" + java.lang.Long.toHexString(v)
      override def call(requestJson: String): String = {
        val req = new ObjectMapper().readTree(requestJson)
        req.path("method").asText() match {
          case "eth_blockNumber" =>
            s"""{"jsonrpc":"2.0","id":1,"result":"${hexQty(head)}"}"""
          case "eth_getLogs" =>
            val f = req.path("params").get(0)
            val from = EthJsonRpc.parseQuantityHex(f.path("fromBlock").asText())
            val to = EthJsonRpc.parseQuantityHex(f.path("toBlock").asText())
            val topic0 = Option(f.get("topics")).map(_.get(0).asText())
            assert(topic0.contains(schema.topic0Hex),
              "the registered topic0 filter must reach the node")
            val logs = (from to to).flatMap { b =>
              (0 until 2).map { i =>
                val u = (b + i) % 3
                s"""{"address":"0x${"aa" * 20}","topics":[
                   "${schema.topic0Hex}","0x${"%064x".format(u)}",
                   "0x${"%064x".format(u + 1)}"],
                   "data":"0x${"%064x".format(b * 10 + i)}",
                   "blockNumber":"${hexQty(b)}","logIndex":"${hexQty(i.toLong)}",
                   "transactionHash":"0x${"%064x".format(b)}",
                   "removed":false}""".replaceAll("\n\\s*", "")
              }
            }
            s"""{"jsonrpc":"2.0","id":1,"result":[${logs.mkString(",")}]}"""
          case other => s"""{"jsonrpc":"2.0","id":1,"error":{"code":-32601,"message":"$other"}}"""
        }
      }
    }
    val head = 30L
    RpcLogSource.registerTransport("fake_transfer", new TransferNode(head))
    val stream = spark.readStream.format("graft.sources.RpcLogProvider")
      .option("transport", "fake_transfer").option("confirmations", "0")
      .option("blockStep", "11")
      .option("topic0", schema.topic0Hex).load()
    val decoded = graft.operators.EventDecoder
      .decode(EventLog.assertNoRemoved(stream), schema)
      .select(lower(hex($"from")).as("from_hex"),
        $"value".cast("decimal(38,0)").as("v"))
    val q = decoded.groupBy($"from_hex")
      .agg(sum($"v").as("inflow"))
      .writeStream.format("memory").queryName("rpc_flagship")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", tmp()).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("rpc_flagship")
      .select($"from_hex", $"inflow".cast("long"))
      .as[(String, Long)].collect().toMap
    // same pure function, folded directly
    val expected = (0L to head).flatMap(b => (0 until 2).map(i =>
        ("%040x".format((b + i) % 3), b * 10 + i)))
      .groupMapReduce(_._1)(_._2)(_ + _)
    assert(got == expected)
  }

  test("Trigger.AvailableNow drains the snapshotted head then stops") {
    RpcLogSource.registerTransport("fake_avail",
      new SimEthNode(head = 30L, logsPerBlock = 1))
    val stream = spark.readStream.format("graft.sources.RpcLogProvider")
      .option("transport", "fake_avail").option("confirmations", "0")
      .option("blockStep", "8").load()
    val q = stream.writeStream.format("memory").queryName("rpc_avail")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmp()).start()
    assert(q.awaitTermination(120000), "AvailableNow query did not terminate")
    assert(spark.table("rpc_avail").count() == 31L)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
  }
}
