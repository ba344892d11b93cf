package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Hex, Keccak256}
import graft.plans.GraftFunctions

/** EngineSession (S8 StreamFactory parity) + SQL function registration. */
class SessionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val usdc = "0xA0b86991c6218b36c1d19D4a2e9Eb0cE3606eB48"
  private val transfer =
    "Transfer(address indexed from, address indexed to, uint value)"

  test("register/make parity: handle carries signature, duplicates rejected") {
    val s = new EngineSession(spark)
    val h = s.register(usdc, transfer)
    assert(h.signatureHex._1 == usdc.toLowerCase)
    assert(h.signatureHex._2 ==
      "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
    intercept[IllegalArgumentException](s.register(usdc, transfer))
    s.register(usdc, "Approval(address indexed owner, address indexed spender, uint value)")
    assert(s.sources.size == 2)
  }

  test("sink() freezes registration (get_sink consumes the factory)") {
    val s = new EngineSession(spark)
    s.register(usdc, transfer)
    assert(s.sink().size == 1)
    intercept[IllegalArgumentException](s.register(usdc, "Ping()"))
  }

  test("rawLogFilter keeps only registered signatures in range") {
    val s = new EngineSession(spark,
      StreamConfig(fromBlock = 0L, toBlock = 10L))
    val h = s.register(usdc, transfer)
    val other = Keccak256.hash("Other()")
    val logs = Seq(
      (1L, Hex.address(usdc), h.topic0),   // registered, in range
      (11L, Hex.address(usdc), h.topic0),  // out of range
      (2L, Hex.address(usdc), other),      // wrong topic
      (3L, Hex.address("0x" + "99" * 20), h.topic0)) // wrong address
      .toDF("block_number", "address", "topic0")
    val kept = s.rawLogFilter(logs).select($"block_number").as[Long].collect()
    assert(kept.toSeq == Seq(1L))
  }

  test("anonymous events route by address: filter, decode, frontier") {
    val s = new EngineSession(spark,
      StreamConfig(fromBlock = 0L, toBlock = 100L))
    val anonAddr = "0x" + "ab" * 20
    val h = s.register(anonAddr, "Pair(uint a, address indexed who) anonymous")
    val hNamed = s.register(usdc, transfer)
    val who = Hex.address("0x" + "77" * 20)
    val logs = Seq(
      // anonymous log: topic0 = first indexed param (who), not a signature
      (1L, Hex.address(anonAddr), Array.fill[Byte](12)(0) ++ who,
        Hex.decode("00" * 31 + "07")),
      // named Transfer log on the other address
      (2L, Hex.address(usdc), hNamed.topic0, Hex.decode("00" * 31 + "2a")))
      .toDF("block_number", "address", "topic0", "data")
      .withColumn("topic1", lit(hNamed.topic0)) // arbitrary word for Transfer
      .withColumn("topic2", lit(hNamed.topic0))
      .withColumn("topic3", lit(null).cast("binary"))
    // both logs survive the registry filter (anonymous matched by address)
    val kept = s.rawLogFilter(logs)
    assert(kept.count() == 2)
    // decode routes the anonymous log by address and reads params from topic0
    val out = s.decode(logs, h).select($"a".cast("int"), $"who").collect()
    assert(out.length == 1 && out.head.getInt(0) == 7)
    assert(out.head.getAs[Array[Byte]](1).toSeq == who.toSeq)
    // frontier keys the anonymous stream by address: both produced → min
    assert(s.frontier(logs).as[Long].collect().toSeq == Seq(1L))
  }

  test("anonymous registration claims its address exclusively") {
    val s = new EngineSession(spark)
    s.register(usdc, "Pair(uint a) anonymous")
    // a second registration on the anonymous address is ambiguous
    intercept[IllegalArgumentException](s.register(usdc, transfer))
    // and the reverse order: anonymous onto an already-named address
    val s2 = new EngineSession(spark)
    s2.register(usdc, transfer)
    intercept[IllegalArgumentException](s2.register(usdc, "Pair(uint a) anonymous"))
  }

  test("decodeAll: one projection routes and decodes every registration") {
    val s = new EngineSession(spark)
    val hT = s.register(usdc, transfer)
    val hA = s.register("0x" + "bb" * 20,
      "Approval(address indexed owner, uint spent)")
    val from = Hex.address("0x" + "11" * 20)
    val to = Hex.address("0x" + "22" * 20)
    def word(addr: Array[Byte]) = Array.fill[Byte](12)(0) ++ addr
    val logs = Seq(
      (1L, 0L, hT.address, hT.topic0, word(from), word(to),
        Hex.decode("00" * 31 + "2a")),
      (2L, 0L, hA.address, hA.topic0, word(from), null,
        Hex.decode("00" * 31 + "07")))
      .toDF("block_number", "log_index", "address", "topic0",
        "topic1", "topic2", "data")
      .withColumn("topic3", lit(null).cast("binary"))
    val out = s.decodeAll(logs).orderBy($"block_number")
    // struct columns are named by event, disjointly null
    val rows = out.select($"event_name", $"transfer.value".cast("long"),
      $"transfer.from", $"approval.owner", $"approval.spent".cast("long"))
      .collect()
    assert(rows(0).getString(0) == "transfer")
    assert(rows(0).getLong(1) == 42L)
    assert(rows(0).getAs[Array[Byte]](2).toSeq == from.toSeq)
    assert(rows(0).isNullAt(3) && rows(0).isNullAt(4))
    assert(rows(1).getString(0) == "approval")
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(1).getAs[Array[Byte]](3).toSeq == from.toSeq)
    assert(rows(1).getLong(4) == 7L)
    // same declaration registered twice (second address) uniquifies
    val s2 = new EngineSession(spark)
    s2.register(usdc, transfer)
    s2.register("0x" + "cc" * 20, transfer)
    val cols = s2.decodeAll(logs).columns.toSeq
    assert(cols.contains("transfer") && cols.contains("transfer_2"))
    // single-pass shape: no shuffle anywhere in the plan
    assert(!s.decodeAll(logs).queryExecution.executedPlan.toString
      .contains("Exchange"))

    // decode() parity: the wide-numeric raw twin rides INSIDE the struct
    // — a max-uint256 value nulls the typed column but keeps the word
    val maxVal = Hex.decode("ff" * 32)
    val bigLog = Seq((3L, 0L, hT.address, hT.topic0, word(from), word(to),
        maxVal))
      .toDF("block_number", "log_index", "address", "topic0",
        "topic1", "topic2", "data")
      .withColumn("topic3", lit(null).cast("binary"))
    val big = s.decodeAll(bigLog)
      .select($"transfer.value", $"transfer.value_raw").collect().head
    assert(big.isNullAt(0), "2^256-1 overflows Decimal(38,0)")
    assert(big.getAs[Array[Byte]](1).toSeq == maxVal.toSeq,
      "the lossless raw word must survive the one-scan path")

    // name collisions fail loudly instead of duplicating output columns
    val s3 = new EngineSession(spark)
    s3.register(usdc, "Address(uint w)")
    intercept[IllegalArgumentException](s3.decodeAll(logs))
    val s4 = new EngineSession(spark)
    s4.register(usdc, transfer)
    s4.register("0x" + "cc" * 20, transfer)
    s4.register("0x" + "dd" * 20, "Transfer_2(uint w)")
    intercept[IllegalArgumentException](s4.decodeAll(logs))
  }

  test("frontier over registered signatures: None until all produce") {
    val s = new EngineSession(spark)
    val h1 = s.register(usdc, transfer)
    val h2 = s.register("0x" + "aa" * 20, "Ping()")
    def logs(rows: (Long, Array[Byte], Array[Byte])*) =
      rows.toDF("block_number", "address", "topic0")
    val one = logs((5L, h1.address, h1.topic0))
    assert(s.frontier(one).count() == 0)
    val both = logs((5L, h1.address, h1.topic0), (3L, h2.address, h2.topic0))
    assert(s.frontier(both).as[Long].collect().toSeq == Seq(3L))
    // zero registrations: loud, not one NULL-frontier row
    intercept[IllegalArgumentException](new EngineSession(spark).frontier(both))
  }

  test("SQL functions registered on a live session") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
           cast(u256_to_decimal(unhex(repeat('00', 31) || 'ff')) as int) AS v,
           hex(keccak256(cast('' as binary))) AS k,
           vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
           size(minhash_sig(array(1L, 2L), 16)) AS m,
           token_counts('The quick, brown fox!') AS tc,
           rolling_fp('ab', 1000000007) AS fp,
           size(ngram_hashes(array(1L, 1L, 1L), 2, false)) AS ng,
           cast(element_at(abi_word_tail_array(
             unhex(repeat('00', 31) || '20' || repeat('00', 31) || '01'
               || repeat('00', 31) || '2a'), 0), 1) as int) AS arr,
           abi_word_nonzero(unhex('80' || repeat('00', 31))) AS nz,
           element_at(abi_dyn_tail_array(
             unhex(repeat('00', 31) || '20' || repeat('00', 31) || '01'
               || repeat('00', 31) || '20' || repeat('00', 31) || '02'
               || '6869' || repeat('00', 30)), 0, true), 1) AS dyn""").head()
    assert(r.getInt(0) == 255)
    assert(r.getString(1).toLowerCase ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(r.getDouble(2) == 11.0)
    assert(r.getInt(3) == 16)
    assert(r.getSeq[Long](4) == Seq(4L, 6L))
    assert(r.getLong(5) == 12805L)
    assert(r.getInt(6) == 2) // multiplicity kept with distinct=false
    assert(r.getInt(7) == 42)
    assert(r.getBoolean(8)) // high-bit garbage word is still nonzero
    assert(r.getString(9) == "hi") // [head][n=1][off=0x20][len=2]["hi"]

    val r2 = spark.sql(
      // the decomposed 'e' + U+0301 rides as raw UTF-8 in the literal
      // (Spark's chr() is ASCII-only, so it can't build it in-SQL)
      s"""SELECT
           nfc_normalize('é') AS nfc,
           term_tf('The cat and THE dog', array('the', 'dog')) AS tf""").head()
    assert(r2.getString(0) == "é") // e + combining acute → é
    assert(r2.getSeq[Long](1) == Seq(5L, 2L, 1L)) // dl, tf(the), tf(dog)

    // the vector/quant/dhash kernels are on the SQL surface too
    val r3 = spark.sql(
      """SELECT
           size(dhash_bands('some image bytes stand-in', 4, 16)) AS db,
           element_at(nearest_centroids(array(0.9D, 0.1D),
             array(array(1.0D, 0.0D), array(0.0D, 1.0D)), 1), 1) AS nc,
           q.r.scale > 0D AS qs,
           dot_codes(array(1.0D, 2.0D), q.r.codes) * q.r.scale AS dc,
           codes_dot(q.r.codes, q.r.codes) AS cc
         FROM (SELECT
           quant_residual(array(1.0D, 2.0D), array(0.0D, 0.0D), 127) AS r) q
      """).head()
    assert(r3.getInt(0) == 4) // 4 band keys
    assert(r3.getInt(1) == 0) // (0.9, 0.1) → centroid 0
    // natural literal spellings work too: unsuffixed 1.0 is DECIMAL and
    // bare 1 is INT in SQL — both must coerce, not ClassCastException
    assert(spark.sql("""SELECT element_at(nearest_centroids(
        array(0.1D, 0.9D), array(array(1.0, 0), array(0, 1)), 1), 1)""")
      .head().getInt(0) == 1)
    // ragged codebooks fail loudly, never silently truncate
    val ragged = intercept[Exception](spark.sql("""SELECT
        nearest_centroids(array(1.0D), array(array(1.0D), array(1.0D, 2.0D)), 1)
      """).head())
    assert(ragged.getMessage != null &&
      ragged.toString.contains("uniform length"), ragged.toString)
    assert(r3.getBoolean(2)) // nonzero residual ⇒ positive scale
    // dot_codes is the RAW code dot (Σ q_i·code_i); times the stored
    // scale it reconstructs ≈ ‖v‖² = 5 (codes = round(v/scale))
    assert(math.abs(r3.getDouble(3) - 5.0) < 0.05)
    assert(r3.getLong(4) > 0L) // int8 × int8 self-dot is positive
  }

  test("sequencePattern: k-event runs counted per block") {
    val d = Seq(
      (0L, "view"), (1L, "view"), (2L, "click"), // match at pos 0? view,view,click → yes at idx 0
      (3L, "view"), (4L, "click"),
      (12L, "view"), (13L, "view"), (14L, "click"))
      .toDF("event_id", "event_type")
      .withColumn("block_number", expr("event_id DIV 10"))
      .withColumn("log_index", expr("event_id % 10"))
    val out = graft.operators.EventLog.sequencePattern(d, Seq("view", "view", "click"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 1L, 1L -> 1L))
  }
}
