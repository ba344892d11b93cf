package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.abi
import graft.model.{EventSchema, Hex, Keccak256}
import graft.operators.EventDecoder

/** P2 decode path: native u256/keccak expressions + full Transfer
  * encode→decode roundtrip with null-on-mismatch semantics.
  */
class AbiDecodeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("u256 expression: goldens, 38-digit boundary, overflow → null") {
    val max38 = BigInt(10).pow(38) - 1
    val rows = Seq(
      (1L, word("0")), (2L, word("1")), (3L, word("ff")),
      (4L, word(max38.toString(16))),          // largest representable
      (5L, word(BigInt(10).pow(38).toString(16))), // 39 digits → null
      (6L, word("f" * 64)))                    // 2^256-1 → null
      .toDF("id", "w")
    val out = rows.select($"id", abi.u256($"w").as("v"))
      .as[(Long, Option[BigDecimal])].collect().toMap
    assert(out(1L).get == BigDecimal(0))
    assert(out(2L).get == BigDecimal(1))
    assert(out(3L).get == BigDecimal(255))
    assert(out(4L).get == BigDecimal(max38))
    assert(out(5L).isEmpty)
    assert(out(6L).isEmpty)
  }

  test("i256 expression: negative two's-complement words") {
    val minusOne = Array.fill[Byte](32)(-1)
    val out = Seq((1L, minusOne)).toDF("id", "w")
      .select(abi.i256($"w")).as[BigDecimal].collect().head
    assert(out == BigDecimal(-1))
  }

  test("fixed-point params decode exactly; out-of-range magnitudes null") {
    val schema = EventSchema.parse(
      "Quote(ufixed128x6 price, fixed128x6 delta, ufixed wide)")
    // sparkType: Decimal(38, N); bare ufixed canonicalizes to 128x18
    assert(schema.sparkType("ufixed128x6").toString == "DecimalType(38,6)")
    assert(schema.sparkType("ufixed").toString == "DecimalType(38,18)")
    def w(hex: String) = word(hex)
    val micro = 123456789L // 123.456789 at scale 6
    val raw = Seq((1L,
      w(micro.toHexString) ++
        // -micro two's complement, sign-extended to 32 bytes
        BigInt(-micro).toByteArray.reverse.padTo(32, (-1).toByte).reverse ++
        w((BigInt(10).pow(18) * 5).toString(16)) // 5×10^18 → 5.0 at x18
    )).toDF("id", "data")
      .withColumn("topic0", lit(schema.topic0))
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
      .withColumn("block_number", lit(1L)).withColumn("log_index", lit(0L))
    val out = EventDecoder.decode(raw, schema)
      .select($"price", $"delta", $"wide")
      .as[(Option[BigDecimal], Option[BigDecimal], Option[BigDecimal])]
      .collect().head
    assert(out._1.get == BigDecimal("123.456789"))
    assert(out._2.get == BigDecimal("-123.456789"))
    assert(out._3.get == BigDecimal(5))
    // the null threshold is 38 significant digits of the RAW word (the
    // full Decimal(38,6) value range): value 10^33 (raw 10^39, 40
    // digits) overflows → null, but value 10^27 (raw 10^33) fits
    // Decimal(38,6) and must decode — the divide-after-cast decode
    // used to null it at the 38−N raw-digit cap
    def decodePrice(dataBlob: Array[Byte]): Option[BigDecimal] = {
      val df = Seq((1L, dataBlob)).toDF("id", "data")
        .withColumn("topic0", lit(schema.topic0))
        .withColumn("topic1", lit(null).cast("binary"))
        .withColumn("topic2", lit(null).cast("binary"))
        .withColumn("topic3", lit(null).cast("binary"))
        .withColumn("block_number", lit(1L)).withColumn("log_index", lit(0L))
      EventDecoder.decode(df, schema)
        .select($"price").as[Option[BigDecimal]].collect().head
    }
    val over = decodePrice(
      w((BigInt(10).pow(33) * BigInt(10).pow(6)).toString(16)) ++
        w("0") ++ w("0"))
    assert(over.isEmpty, "out-of-range fixed magnitude must null, not wrap")
    val wide = decodePrice(
      w((BigInt(10).pow(27) * BigInt(10).pow(6)).toString(16)) ++
        w("0") ++ w("0"))
    assert(wide.contains(BigDecimal(BigInt(10).pow(27))),
      "a value inside Decimal(38,6) must decode even when the raw word " +
        "exceeds 38−N digits")
  }

  test("keccak256 expression matches the pure-Scala digest") {
    val payload = "hello world".getBytes("UTF-8")
    val out = Seq(Tuple1(payload)).toDF("b")
      .select(abi.keccak256($"b")).as[Array[Byte]].collect().head
    assert(out.toSeq == Keccak256.hash(payload).toSeq)
  }

  test("Transfer encode → decode roundtrip; mismatched topic0 → null") {
    val schema = EventSchema.parse(
      "Transfer(address indexed from, address indexed to, uint value)")
    val from = Hex.address("0x" + "11" * 20)
    val to = Hex.address("0x" + "22" * 20)
    val raw = Seq(
      (1L, 0L, schema.topic0, pad32(from), pad32(to), word("5af3107a4000")), // 1e14
      (2L, 1L, Keccak256.hash("Other()"), pad32(from), pad32(to), word("1")))
      .toDF("block_number", "log_index", "topic0", "topic1", "topic2", "data")
      .withColumn("topic3", lit(null).cast("binary"))
    val decoded = EventDecoder.decode(raw, schema)
      .select($"block_number", $"from", $"to", $"value".cast("string"))
      .as[(Long, Array[Byte], Array[Byte], Option[String])].collect()
      .map(r => r._1 -> ((Option(r._2).map(_.toSeq), Option(r._3).map(_.toSeq), r._4)))
      .toMap
    assert(decoded(1L) ==
      ((Some(from.toSeq), Some(to.toSeq), Some("100000000000000"))))
    assert(decoded(2L) == ((None, None, None)))
  }

  test("raw twin columns only for widths that can overflow Decimal(38,0)") {
    val schema = EventSchema.parse(
      "Mixed(uint8 small, uint120 wide, uint128 over, uint big, int64 nar)")
    val raw = Seq((1L, 0L, schema.topic0,
        word("1") ++ word("2") ++ word("3") ++ word("4") ++ word("5")))
      .toDF("block_number", "log_index", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val cols = EventDecoder.decode(raw, schema).columns.toSet
    // ≤120 bits always fits Decimal(38,0) — no twin; ≥128 bits can
    // exceed 10^38−1 — lossless twin required
    assert(!cols("small_raw") && !cols("wide_raw") && !cols("nar_raw"))
    assert(cols("over_raw") && cols("big_raw"))
  }

  test("uint[] / address[] params decode from the dynamic tail; empty → []") {
    val schema = EventSchema.parse(
      "Batch(address indexed from, uint[] amounts, address[] tos)")
    val from = Hex.address("0x" + "44" * 20)
    val a1 = Hex.address("0x" + "55" * 20)
    val a2 = Hex.address("0x" + "66" * 20)
    // data layout: [head amounts=0x40][head tos][amounts: n,…][tos: n,…]
    def mk(amounts: Seq[Long], tos: Seq[Array[Byte]]): Array[Byte] = {
      val amountsTail = word(amounts.length.toHexString) ++
        amounts.flatMap(a => word(a.toHexString)).toArray
      val tosTail = word(tos.length.toHexString) ++ tos.flatMap(pad32).toArray
      word("40") ++ word((64 + amountsTail.length).toHexString) ++
        amountsTail ++ tosTail
    }
    val raw = Seq(
      (1L, schema.topic0, pad32(from), mk(Seq(7L, 9L, 11L), Seq(a1, a2))),
      (2L, schema.topic0, pad32(from), mk(Seq.empty, Seq.empty)))
      .toDF("block_number", "topic0", "topic1", "data")
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select($"block_number",
        expr("transform(amounts, x -> cast(x as long))").as("amounts"),
        expr("transform(tos, x -> lower(hex(x)))").as("tos"))
      .as[(Long, Seq[Long], Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 == Seq(7L, 9L, 11L))
    assert(out(1L)._2 == Seq("55" * 20, "66" * 20))
    assert(out(2L) == ((Seq.empty, Seq.empty)))
    // arrays carry no lossless twin — the raw data blob is the twin
    assert(!EventDecoder.decode(raw, schema).columns.contains("amounts_raw"))
  }

  test("malformed uint[] tails decode defensively: clamp, never throw") {
    val schema = EventSchema.parse("Bad(uint[] xs)")
    val raw = Seq(
      // head offset points past the blob → null array
      (1L, schema.topic0, word("ffff")),
      // claimed n=1000 but only 1 element present → clamped to 1
      (2L, schema.topic0, word("20") ++ word("3e8") ++ word("2a")),
      // truncated: head word only, no length word → null array
      (3L, schema.topic0, word("20")))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select($"block_number",
        expr("transform(xs, x -> cast(x as long))").as("xs"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(Seq(42L)))
    assert(out(3L).isEmpty)

    // the non-numeric (HOF) element path must clamp the same way: a
    // garbage length must neither allocate nor read past the blob
    val schemaA = EventSchema.parse("BadA(bytes32[] xs)")
    val rawA = Seq(
      (1L, schemaA.topic0, word("20") ++ word("7fffffff") ++ word("2a")),
      (2L, schemaA.topic0, word("ffff")))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val outA = EventDecoder.decode(rawA, schemaA)
      .select($"block_number", coalesce(size($"xs"), lit(-1)))
      .as[(Long, Int)].collect().toMap
    assert(outA(1L) == 1) // claimed 2^31-1 elements, blob holds 1
    assert(outA(2L) == -1) // head offset outside the blob → null array

    // the 2^31..10^38 window: a word that FITS Decimal(38,0) but
    // overflows int must null, not throw — under Spark 4's ANSI default
    // a bare cast aborts the whole job on one corrupt word (regression:
    // intWord range guard)
    val schemaS = EventSchema.parse("BadS(string s)")
    val rawS = Seq(
      (1L, schemaS.topic0, word("100000000")), // offset 2^32
      (2L, schemaS.topic0,
        word("20") ++ word("100000000") ++ word("2a"))) // len 2^32
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val outS = EventDecoder.decode(rawS, schemaS)
      .select($"block_number", $"s").as[(Long, Option[String])]
      .collect().toMap
    assert(outS(1L).isEmpty)
    assert(outS(2L).isEmpty)
  }

  test("bool[] tails decode through the slice kernel: nonzero word → true") {
    val schema = EventSchema.parse("Flags(bool[] fs)")
    // [head=0x20][n=3][0][1][2^255-ish high bit] — any nonzero byte is true
    val high = Array.fill[Byte](32)(0); high(0) = 1
    val raw = Seq(
      (1L, schema.topic0, word("20") ++ word("3") ++ word("0") ++ word("1") ++ high))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select($"fs").as[Seq[Boolean]].collect().head
    assert(out == Seq(false, true, true))
  }

  test("string[] tails decode: offset-indirected elements, multi-word payloads") {
    val schema = EventSchema.parse("Tagged(string[] tags)")
    assert(schema.signature == "Tagged(string[])")
    val long = "0123456789" * 4 // 40 chars → 2 payload words
    // [head=0x20][n=2][off0=0x40][off1=0x80][len=3]["abc".pad][len=40][long.pad]
    val data = word("20") ++ word("2") ++ word("40") ++ word("80") ++
      word("3") ++ padRight("abc".getBytes("UTF-8"), 32) ++
      word("28") ++ padRight(long.getBytes("UTF-8"), 64)
    val raw = Seq((1L, schema.topic0, data))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select($"tags").as[Seq[String]].collect().head
    assert(out == Seq("abc", long))
  }

  test("bytes[] tails decode; malformed element offsets null that element only") {
    val schema = EventSchema.parse("Blobs(bytes[] bs)")
    // elem0 fine, elem1's offset points past the blob → null element;
    // elem2's length word lies → payload clamps to what the blob holds
    // rel offsets from the element-list base: elem0 at 3*32=0x60 (past the
    // offset words), elem2 at 0x60+0x40=0xa0 (past elem0's len+payload)
    val data = word("20") ++ word("3") ++
      word("60") ++ word("ffff0") ++ word("a0") ++
      word("2") ++ padRight(Array[Byte](7, 9), 32) ++
      word("40") ++ padRight(Array[Byte](1, 2, 3), 32)
    val raw = Seq((1L, schema.topic0, data))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select($"bs").as[Seq[Option[Array[Byte]]]].collect().head
    assert(out.length == 3)
    assert(out(0).get.toSeq == Seq[Byte](7, 9))
    assert(out(1).isEmpty)
    // claimed 0x40 bytes; only 32 remain after the length word
    assert(out(2).get.length == 32)
  }

  test("offset words with nonzero high bytes are malformed, never truncated") {
    // a crafted head offset of 2^32 + 0x20 must NOT silently truncate to
    // 0x20 and decode plausible-looking data — the array nulls out
    val schema = EventSchema.parse("Nums(uint[] xs)")
    val evil = word("20"); evil(27) = 1 // = 2^32 + 32
    val okTail = word("1") ++ word("2a")
    val raw = Seq(
      (1L, schema.topic0, evil ++ okTail),
      (2L, schema.topic0, word("20") ++ okTail))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select($"block_number", coalesce(size($"xs"), lit(-1)))
      .as[(Long, Int)].collect().toMap
    assert(out(1L) == -1) // malformed head → null array
    assert(out(2L) == 1)  // same low bytes, clean word → decodes

    // per-element offset with a high byte → that ELEMENT nulls out
    val schemaS = EventSchema.parse("Tags(string[] tags)")
    val evilOff = word("40"); evilOff(5) = 1
    val data = word("20") ++ word("2") ++ word("40") ++ evilOff ++
      word("1") ++ padRight("x".getBytes("UTF-8"), 32)
    val rawS = Seq((1L, schemaS.topic0, data))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val outS = EventDecoder.decode(rawS, schemaS)
      .select($"tags").as[Seq[Option[String]]].collect().head
    assert(outS == Seq(Some("x"), None))
  }

  test("uint[][] nested tails decode; malformed inner offsets null that inner only") {
    val schema = EventSchema.parse("Matrix(uint[][] m, uint tag)")
    assert(schema.signature == "Matrix(uint256[][],uint256)")
    // m = [[7],[8,9]]: [head=0x40][tag=5][n=2][off0=0x40][off1=0x80]
    //                  [m0=1][7][m1=2][8][9]
    val data = word("40") ++ word("5") ++ word("2") ++
      word("40") ++ word("80") ++
      word("1") ++ word("7") ++ word("2") ++ word("8") ++ word("9")
    val raw = Seq((1L, schema.topic0, data))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select(expr("transform(m, r -> transform(r, x -> cast(x as long)))"),
        $"tag".cast("long"))
      .as[(Seq[Seq[Long]], Long)].collect().head
    assert(out == ((Seq(Seq(7L), Seq(8L, 9L)), 5L)))

    // inner offset with a nonzero high byte → that inner array nulls out
    val evil = word("40"); evil(3) = 1
    val dataBad = word("20") ++ word("2") ++ evil ++ word("80") ++
      word("1") ++ word("7") ++ word("2") ++ word("8") ++ word("9")
    val schemaB = EventSchema.parse("M2(uint[][] m)")
    val rawBad = Seq((1L, schemaB.topic0, dataBad))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val outBad = EventDecoder.decode(rawBad, schemaB)
      .select(expr("transform(m, r -> transform(r, x -> cast(x as long)))"))
      .as[Seq[Option[Seq[Long]]]].collect().head
    assert(outBad == Seq(None, Some(Seq(8L, 9L))))
  }

  test("string[k] fixed-size dynamic arrays: one head word, k offsets, no length") {
    val schema = EventSchema.parse("Pair2(string[2] ab, uint v)")
    assert(schema.signature == "Pair2(string[2],uint256)")
    // data: [head=0x40][v=42][off0=0x40][off1=0x80][len=1]["x".pad][len=2]["yz".pad]
    val data = word("40") ++ word("2a") ++
      word("40") ++ word("80") ++
      word("1") ++ padRight("x".getBytes("UTF-8"), 32) ++
      word("2") ++ padRight("yz".getBytes("UTF-8"), 32)
    val raw = Seq((1L, schema.topic0, data))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select($"ab", $"v".cast("long")).as[(Seq[String], Long)].collect().head
    assert(out == ((Seq("x", "yz"), 42L)))
  }

  test("scalar bool matches the bool[] kernel on garbage high-bit words") {
    // a word whose value overflows Decimal(38,0) must still decode true
    // as a SCALAR, exactly like the array element path — one contract
    val schema = EventSchema.parse("Flag(bool f)")
    val high = Array.fill[Byte](32)(0); high(0) = 1
    val raw = Seq(
      (1L, schema.topic0, high),
      (2L, schema.topic0, word("0")),
      (3L, schema.topic0, word("1")))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select($"block_number", $"f").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("fixed-size static arrays are inlined words; later params keep their offset") {
    // Pair(uint[2] xy, uint z): data = [xy0][xy1][z] — z must read word 2,
    // not word 1 (the k-word inline advance)
    val schema = EventSchema.parse("Pair(uint[2] xy, uint z)")
    assert(schema.signature == "Pair(uint256[2],uint256)")
    val raw = Seq((1L, schema.topic0, word("7") ++ word("9") ++ word("2a")))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select(expr("transform(xy, x -> cast(x as long))"), $"z".cast("long"))
      .as[(Seq[Long], Long)].collect().head
    assert(out == ((Seq(7L, 9L), 42L)))
    // no raw twin for array params, and none for the narrow inline words
    assert(!EventDecoder.decode(raw, schema).columns.contains("xy_raw"))

    // an INDEXED fixed-size array is stored hashed — decode keeps the topic
    val schemaI = EventSchema.parse("Tagged(uint[2] indexed xs, uint v)")
    val fakeHash = graft.model.Keccak256.hash("whatever")
    val rawI = Seq((1L, schemaI.topic0, fakeHash, word("5")))
      .toDF("block_number", "topic0", "topic1", "data")
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val outI = EventDecoder.decode(rawI, schemaI)
      .select($"xs", $"v".cast("long")).as[(Array[Byte], Long)].collect().head
    assert(outI._1.toSeq == fakeHash.toSeq && outI._2 == 5L)
  }

  test("static tuple params decode inline; later params keep their offset") {
    // Trade((address maker,uint256 amount) order, uint fee):
    // data = [maker word][amount word][fee] — fee must read word 2
    val schema = EventSchema.parse(
      "Trade((address maker, uint256 amount) order, uint fee)")
    assert(schema.signature == "Trade((address,uint256),uint256)")
    val maker = Hex.address("0x" + "77" * 20)
    val raw = Seq((1L, schema.topic0, pad32(maker) ++ word("2a") ++ word("7")))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select($"order.maker", $"order.amount".cast("long"), $"fee".cast("long"))
      .as[(Array[Byte], Long, Long)].collect().head
    assert(out._1.toSeq == maker.toSeq && out._2 == 42L && out._3 == 7L)
    // mismatched topic0 → the whole struct nulls out
    val bad = Seq((2L, Keccak256.hash("Other()"),
        pad32(maker) ++ word("2a") ++ word("7")))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val badOut = EventDecoder.decode(bad, schema)
      .select(isnull($"order"), isnull($"fee")).as[(Boolean, Boolean)]
      .collect().head
    assert(badOut == ((true, true)))
  }

  test("dynamic tuple params decode through the offset-relative component area") {
    // Listing((uint256 id,string uri,bool live) item, uint v):
    // data = [head item=0x40][v][tuple: id word, uri off=0x60 (rel), live,
    //         len, payload]
    val schema = EventSchema.parse(
      "Listing((uint256 id, string uri, bool live) item, uint v)")
    assert(schema.signature == "Listing((uint256,string,bool),uint256)")
    val uri = "ipfs://x"
    val data = word("40") ++ word("5") ++
      word("9") ++ word("60") ++ word("1") ++
      word(uri.length.toHexString) ++ padRight(uri.getBytes("UTF-8"), 32)
    val raw = Seq((1L, schema.topic0, data))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select($"item.id".cast("long"), $"item.uri", $"item.live",
        $"v".cast("long"))
      .as[(Long, String, Boolean, Long)].collect().head
    assert(out == ((9L, uri, true, 5L)))
  }

  test("tuple arrays decode to ARRAY<STRUCT>; malformed heads null out, counts clamp") {
    val schema = EventSchema.parse(
      "Fills((address taker, uint256 amt, bool ok)[] fills, uint nonce)")
    assert(schema.signature == "Fills((address,uint256,bool)[],uint256)")
    val a1 = Hex.address("0x" + "aa" * 20)
    val a2 = Hex.address("0x" + "bb" * 20)
    // data = [head fills=0x40][nonce=9][n=2][t0: addr,amt,ok][t1: …]
    val data = word("40") ++ word("9") ++ word("2") ++
      pad32(a1) ++ word("64") ++ word("1") ++
      pad32(a2) ++ word("c8") ++ word("0")
    val raw = Seq((1L, schema.topic0, data))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select(posexplode($"fills").as(Seq("i", "f")), $"nonce".cast("long"))
      .select($"i", lower(hex($"f.taker")), $"f.amt".cast("long"), $"f.ok",
        $"nonce")
      .as[(Int, String, Long, Boolean, Long)].collect().toSeq
    assert(out == Seq(
      (0, "aa" * 20, 100L, true, 9L),
      (1, "bb" * 20, 200L, false, 9L)))

    // claimed n=1000 clamps to what the blob holds (3 words per tuple);
    // a head offset outside the blob nulls the whole array
    val schemaB = EventSchema.parse("B((uint,bool)[] xs)")
    val clamp = word("20") ++ word("3e8") ++ word("2a") ++ word("1")
    val rawB = Seq(
      (1L, schemaB.topic0, clamp),
      (2L, schemaB.topic0, word("ffff")))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val outB = EventDecoder.decode(rawB, schemaB)
      .select($"block_number", coalesce(size($"xs"), lit(-1)))
      .as[(Long, Int)].collect().toMap
    assert(outB(1L) == 1)  // 1000 claimed, blob holds one 2-word tuple
    assert(outB(2L) == -1) // malformed head → null array
  }

  test("malformed dynamic-tuple payloads null out, never fabricate zeros") {
    val schema = EventSchema.parse("L((uint256 id, string uri) item)")
    val good = word("20") ++ word("9") ++ word("40") ++
      word("1") ++ padRight("x".getBytes("UTF-8"), 32)
    // head offset past the blob → whole struct null (a blind substring
    // would decode id = 0, uri = "")
    val badHead = word("ffff")
    // component offset word with a nonzero high byte → that component
    // nulls, the static sibling still decodes
    val evilRel = word("40"); evilRel(5) = 1
    val badRel = word("20") ++ word("9") ++ evilRel ++
      word("1") ++ padRight("x".getBytes("UTF-8"), 32)
    // truncated: head + id word only, no offset/len/payload
    val truncated = word("20") ++ word("9")
    val raw = Seq((1L, good), (2L, badHead), (3L, badRel), (4L, truncated))
      .map { case (i, d) => (i, schema.topic0, d) }
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select($"block_number", isnull($"item"),
        $"item.id".cast("long"), $"item.uri")
      .as[(Long, Boolean, Option[Long], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((false, Some(9L), Some("x"))))
    assert(out(2L)._1, "out-of-blob head must null the struct")
    assert(out(3L) == ((false, Some(9L), None)),
      "malformed component offset must null only that component")
    assert(out(4L)._1, "truncated component area must null the struct")
  }

  test("tuples with array components decode through the dynamic-tuple kernel") {
    // Meta((uint256 id, uint[] xs, string s) m, uint v):
    // data = [head m=0x40][v=7][tuple: id=9, xs rel=0x60, s rel=0xc0,
    //         xs: n=2,5,6, s: len=3,"abc".pad]
    val schema = EventSchema.parse(
      "Meta((uint256 id, uint[] xs, string s) m, uint v)")
    assert(schema.signature == "Meta((uint256,uint256[],string),uint256)")
    val data = word("40") ++ word("7") ++
      word("9") ++ word("60") ++ word("c0") ++
      word("2") ++ word("5") ++ word("6") ++
      word("3") ++ padRight("abc".getBytes("UTF-8"), 32)
    val raw = Seq((1L, schema.topic0, data))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select($"m.id".cast("long"),
        expr("transform(m.xs, x -> cast(x as long))"), $"m.s",
        $"v".cast("long"))
      .as[(Long, Seq[Long], String, Long)].collect().head
    assert(out == ((9L, Seq(5L, 6L), "abc", 7L)))

    // malformed array-component offset → that COMPONENT nulls, the
    // static sibling still decodes (same contract as string components)
    val evilRel = word("60"); evilRel(5) = 1
    val dataBad = word("40") ++ word("7") ++
      word("9") ++ evilRel ++ word("c0") ++
      word("2") ++ word("5") ++ word("6") ++
      word("3") ++ padRight("abc".getBytes("UTF-8"), 32)
    val rawBad = Seq((1L, schema.topic0, dataBad))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val outBad = EventDecoder.decode(rawBad, schema)
      .select($"m.id".cast("long"), isnull($"m.xs"), $"m.s")
      .as[(Long, Boolean, String)].collect().head
    assert(outBad == ((9L, true, "abc")))
  }

  test("arrays of DYNAMIC tuples decode with per-element offsets") {
    // Fills((address taker, string memo)[] fills, uint nonce):
    // tail = [n=2][off0=0x40][off1=0xc0][t0: taker, memo rel=0x40,
    //         len=2, "hi".pad][t1: taker2, memo rel=0x40, len=1, "y".pad]
    val schema = EventSchema.parse(
      "Fills2((address taker, string memo)[] fills, uint nonce)")
    assert(schema.signature == "Fills2((address,string)[],uint256)")
    val a1 = Hex.address("0x" + "aa" * 20)
    val a2 = Hex.address("0x" + "bb" * 20)
    def elem(addr: Array[Byte], memo: String) =
      pad32(addr) ++ word("40") ++ word(memo.length.toHexString) ++
        padRight(memo.getBytes("UTF-8"), 32)
    val data = word("40") ++ word("9") ++
      word("2") ++ word("40") ++ word("c0") ++
      elem(a1, "hi") ++ elem(a2, "y")
    val raw = Seq((1L, schema.topic0, data))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select(posexplode($"fills").as(Seq("i", "f")), $"nonce".cast("long"))
      .select($"i", lower(hex($"f.taker")), $"f.memo", $"nonce")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(out == Seq((0, "aa" * 20, "hi", 9L), (1, "bb" * 20, "y", 9L)))

    // a malformed per-element offset nulls that ELEMENT only; a count
    // beyond the blob's offset words clamps
    val evil = word("c0"); evil(3) = 1
    val dataBad = word("40") ++ word("9") ++
      word("3e8") ++ word("40") ++ evil ++
      elem(a1, "hi") ++ elem(a2, "y")
    val rawBad = Seq((1L, schema.topic0, dataBad))
      .toDF("block_number", "topic0", "data")
      .withColumn("topic1", lit(null).cast("binary"))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val outBad = EventDecoder.decode(rawBad, schema)
      .select($"fills").as[Seq[Option[(Array[Byte], String)]]].collect().head
    // n=1000 claimed; the blob holds 10 offset-word slots after the count
    assert(outBad.length == 10)
    assert(outBad(0).exists(_._2 == "hi"))
    assert(outBad(1).isEmpty, "evil per-element offset must null the element")
  }

  test("tuple grammar rejects fixed arrays and nested tuples in components") {
    intercept[IllegalArgumentException](
      EventSchema.parse("X((uint[2] a) t)"))
    intercept[IllegalArgumentException](
      EventSchema.parse("X(((uint,bool) inner, uint b) t)"))
    intercept[IllegalArgumentException](
      EventSchema.parse("X((uint[][] a) t)"))
  }

  test("tuple-array expression rejects an empty component list") {
    intercept[IllegalArgumentException](
      graft.functions.abi.tupleWordTailArray(lit(Array[Byte]()), 0, Seq.empty))
  }

  test("indexed tuples are stored hashed — decode keeps the topic word") {
    val schema = EventSchema.parse("Keyed((uint256,address) indexed k, uint v)")
    val fakeHash = Keccak256.hash("struct-hash")
    val raw = Seq((1L, schema.topic0, fakeHash, word("5")))
      .toDF("block_number", "topic0", "topic1", "data")
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select($"k", $"v".cast("long")).as[(Array[Byte], Long)].collect().head
    assert(out._1.toSeq == fakeHash.toSeq && out._2 == 5L)
  }

  test("dynamic string param decodes from offset/len tail") {
    val schema = EventSchema.parse("Note(address indexed who, string message)")
    val who = Hex.address("0x" + "33" * 20)
    val msg = "hello graft"
    // data = [offset=0x20][len][payload padded]
    val payload = msg.getBytes("UTF-8")
    val data = word("20") ++ word(payload.length.toHexString) ++
      (payload ++ Array.fill[Byte](32 - payload.length % 32)(0))
    val raw = Seq((1L, schema.topic0, pad32(who), data))
      .toDF("block_number", "topic0", "topic1", "data")
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val out = EventDecoder.decode(raw, schema)
      .select($"who", $"message").as[(Array[Byte], String)].collect().head
    assert(out._1.toSeq == who.toSeq && out._2 == msg)
  }

  private def pad32(addr: Array[Byte]): Array[Byte] =
    Array.fill[Byte](12)(0) ++ addr

  /** ABI tail payload padding: right-pad to `len` with zero bytes. */
  private def padRight(b: Array[Byte], len: Int): Array[Byte] =
    b ++ Array.fill[Byte](len - b.length)(0)

  private def word(hexStr: String): Array[Byte] = {
    val clean = if (hexStr.length % 2 == 1) "0" + hexStr else hexStr
    Hex.decode(("0" * (64 - clean.length)) + clean)
  }
}
