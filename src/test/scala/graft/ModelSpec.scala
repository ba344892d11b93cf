package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{EventSchema, Hex, Keccak256}

/** Pure-model tests: keccak against public vectors, hex codecs, and the
  * event-declaration DSL goldens from the reference parser suite
  * (reference: eth_event_macro/src/events.rs:117-194).
  */
class ModelSpec extends AnyFunSuite {

  // -- Keccak-256 (public known-answer vectors) --------------------------
  test("keccak256 of empty string") {
    assert(Keccak256.hex("") ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
  }

  test("keccak256 of 'abc'") {
    assert(Keccak256.hex("abc") ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
  }

  test("keccak256 of a >rate-length message (multi-block absorb)") {
    val msg = "a" * 200 // crosses the 136-byte rate boundary
    assert(Keccak256.hash(msg).length == 32)
    // self-consistency: same input → same digest, different input differs
    assert(Keccak256.hex(msg) == Keccak256.hex("a" * 200))
    assert(Keccak256.hex(msg) != Keccak256.hex("a" * 201))
  }

  test("ERC-20 Transfer topic0 matches the canonical public hash") {
    val schema = EventSchema.parse(
      "Transfer(address indexed from, address indexed to, uint value)")
    assert(schema.topic0Hex ==
      "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
  }

  // -- Hex ---------------------------------------------------------------
  test("hex roundtrip and 0x stripping") {
    val bytes = Array[Byte](0, 1, 127, -128, -1)
    assert(Hex.decode(Hex.encode(bytes)).toSeq == bytes.toSeq)
    assert(Hex.decode("0x00ff").toSeq == Seq[Byte](0, -1))
    assert(Hex.toHex0x(Array[Byte](-34, -83)) == "0xdead")
  }

  test("address() accepts 20 bytes only (reference lib.rs:7-15 parity)") {
    val addr = Hex.address("0xA0b86991c6218b36c1d19D4a2e9Eb0cE3606eB48")
    assert(addr.length == 20)
    intercept[IllegalArgumentException](Hex.address("0x1234"))
  }

  // -- DSL parser goldens (events.rs:117-194) ----------------------------
  test("golden: Transfer declaration") {
    val e = EventSchema.parse(
      "Transfer(address indexed from, address indexed to, uint value)")
    assert(e.name == "Transfer")
    assert(e.params.map(_.name) == Seq("from", "to", "value"))
    assert(e.params.map(_.indexed) == Seq(true, true, false))
    assert(e.params.map(_.canonicalType) == Seq("address", "address", "uint256"))
    assert(e.signature == "Transfer(address,address,uint256)")
    assert(!e.anonymous)
  }

  test("no-param event and anonymous suffix") {
    val p = EventSchema.parse("Ping()")
    assert(p.params.isEmpty && !p.anonymous)
    val a = EventSchema.parse("Ping() anonymous")
    assert(a.anonymous)
  }

  test("reject leading `event` keyword (events.rs:16-18)") {
    intercept[IllegalArgumentException](
      EventSchema.parse("event Transfer(address a)"))
  }

  test("reject trailing garbage (events.rs:81-86)") {
    intercept[IllegalArgumentException](
      EventSchema.parse("Transfer(address a) garbage"))
  }

  test("reject unknown type / duplicate params") {
    intercept[IllegalArgumentException](EventSchema.parse("T(widget a)"))
    intercept[IllegalArgumentException](EventSchema.parse("T(address a, uint a)"))
    // unnamed INDEXED param: would otherwise parse as a non-indexed
    // param NAMED "indexed" — topic0 unchanged, so logs route but every
    // param decodes from the wrong slot (silently wrong values)
    val e = intercept[IllegalArgumentException](
      EventSchema.parse("T(address indexed from, address indexed, uint v)"))
    assert(e.getMessage.contains("unnamed"), e.getMessage)
    // malformed hex fails loudly (parseInt accepted '+'/'-' signs)
    intercept[IllegalArgumentException](Hex.decode("-1-1"))
    intercept[IllegalArgumentException](Hex.decode("zz"))
  }

  test("tuple params: canonical signature, struct field names, rejects") {
    val e = EventSchema.parse(
      "Swap((address maker, uint256 amount) order, (uint,string) info)")
    assert(e.params.map(_.name) == Seq("order", "info"))
    // canonical form strips component names and widens uint → uint256
    assert(e.params.map(_.canonicalType) ==
      Seq("(address,uint256)", "(uint256,string)"))
    assert(e.signature == "Swap((address,uint256),(uint256,string))")
    // declared names become struct fields; unnamed components get f{i}
    val st = e.dataStruct
    assert(st("order").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("maker", "amount"))
    assert(st("info").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("f0", "f1"))
    // indexed tuples parse (stored hashed, like indexed arrays)
    val ix = EventSchema.parse("T((uint256,address) indexed key, uint v)")
    assert(ix.indexedParams.map(_.name) == Seq("key"))

    // tuple ARRAYS: static components only, canonical keeps the suffix
    val ta = EventSchema.parse("Orders((address buyer, uint256 amt)[] orders)")
    assert(ta.params.head.canonicalType == "(address,uint256)[]")
    assert(ta.signature == "Orders((address,uint256)[])")
    assert(ta.dataStruct("orders").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("buyer",
            org.apache.spark.sql.types.BinaryType),
          org.apache.spark.sql.types.StructField("amt",
            org.apache.spark.sql.types.DecimalType(38, 0))))))

    // dynamic components — string/bytes AND dynamic arrays — are allowed
    // in both tuple forms (kernel-decoded, offset-indirected)
    val dyn = EventSchema.parse("T((string,uint)[] x, (uint[] xs,bool ok) y)")
    assert(dyn.params.map(_.canonicalType) ==
      Seq("(string,uint256)[]", "(uint256[],bool)"))
    assert(dyn.dataStruct("y").dataType ==
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("xs",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DecimalType(38, 0))),
        org.apache.spark.sql.types.StructField("ok",
          org.apache.spark.sql.types.BooleanType))))

    // rejects: empty tuple, nested tuple, fixed-size tuple array,
    // fixed/nested arrays inside, unknown component type, bad width,
    // duplicate component names
    intercept[IllegalArgumentException](EventSchema.parse("T(() x)"))
    intercept[IllegalArgumentException](
      EventSchema.parse("T((uint,(address,uint)) x)"))
    intercept[IllegalArgumentException](
      EventSchema.parse("T((uint,address)[2] x)"))
    intercept[IllegalArgumentException](
      EventSchema.parse("T((uint[3],bool) x)"))
    intercept[IllegalArgumentException](EventSchema.parse("T((widget) x)"))
    intercept[IllegalArgumentException](EventSchema.parse("T((uint7) x)"))
    intercept[IllegalArgumentException](
      EventSchema.parse("T((uint a,bool a) x)"))
    // a declared name colliding with an unnamed position's f{i} fallback
    // would build a struct with duplicate field names
    intercept[IllegalArgumentException](
      EventSchema.parse("T((uint, bool f0) x)"))
  }

  test("topics array view roundtrips topic0..topic3 with trailing nulls") {
    import TestSpark.spark
    import spark.implicits._
    val t0 = Keccak256.hash("A()")
    val t1 = Keccak256.hash("x")
    val df = Seq((1L, t0, t1)).toDF("block_number", "topic0", "topic1")
      .withColumn("topic2", org.apache.spark.sql.functions.lit(null).cast("binary"))
      .withColumn("topic3", org.apache.spark.sql.functions.lit(null).cast("binary"))
    val arr = graft.model.LogSchema.withTopicsArray(df)
      .select("topics").as[Seq[Array[Byte]]].collect().head
    assert(arr.length == 2 && arr(0).toSeq == t0.toSeq && arr(1).toSeq == t1.toSeq)
    val back = graft.model.LogSchema.fromTopicsArray(
        graft.model.LogSchema.withTopicsArray(df).drop("topic0", "topic1", "topic2", "topic3"))
      .select("topic0", "topic1", "topic2", "topic3")
      .as[(Array[Byte], Array[Byte], Array[Byte], Array[Byte])].collect().head
    assert(back._1.toSeq == t0.toSeq && back._2.toSeq == t1.toSeq)
    assert(back._3 == null && back._4 == null)
  }

  test("32-byte topic contract: assertTopicWords fails fast on foreign " +
      "minimal encodings; normalizeTopicWords left-pads them to the word") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // a minimal-length 0x07 — the IndexedParamRewrite soundness hazard
    val short = Array[Byte](7)
    val full = new Array[Byte](32); full(31) = 7
    val df = Seq((0L, 0L, short), (1L, 0L, full), (2L, 1L, null: Array[Byte]))
      .toDF("block_number", "log_index", "topic1")
      .withColumn("topic0", lit(full))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))

    val ex = intercept[Exception](
      graft.model.LogSchema.assertTopicWords(df).collect())
    assert(ex.getMessage.contains("topic1") &&
      ex.getMessage.contains("block_number=0"), ex.getMessage)

    val norm = graft.model.LogSchema.normalizeTopicWords(df)
      .select("block_number", "topic1")
      .as[(Long, Array[Byte])].collect().toMap
    assert(norm(0L).toSeq == full.toSeq, "short topic left-padded")
    assert(norm(1L).toSeq == full.toSeq, "full word untouched")
    assert(norm(2L) == null, "null stays null")
    // normalized data passes the gate
    assert(graft.model.LogSchema.assertTopicWords(
      graft.model.LogSchema.normalizeTopicWords(df)).count() == 3)
    // >32 bytes is corrupt, not minimal — normalization refuses
    val long = Seq((0L, 0L, Array.fill[Byte](33)(1)))
      .toDF("block_number", "log_index", "topic1")
      .withColumn("topic0", lit(full))
      .withColumn("topic2", lit(null).cast("binary"))
      .withColumn("topic3", lit(null).cast("binary"))
    val ex2 = intercept[Exception](
      graft.model.LogSchema.normalizeTopicWords(long).collect())
    assert(ex2.getMessage.contains("longer than"), ex2.getMessage)
  }

  test("bytesN: widths 1..32 parse as static BinaryType; 0/33 rejected") {
    val e = EventSchema.parse("Call(bytes4 sel, bytes16 uuid, bytes31 odd)")
    assert(e.dataStruct.fieldNames.toSeq == Seq("sel", "uuid", "odd"))
    assert(e.dataStruct.fields.forall(
      _.dataType == org.apache.spark.sql.types.BinaryType))
    intercept[IllegalArgumentException](EventSchema.parse("X(bytes0 a)"))
    intercept[IllegalArgumentException](EventSchema.parse("X(bytes33 a)"))
    // scalar position only — no bytesN arrays or tuple components
    intercept[IllegalArgumentException](EventSchema.parse("X(bytes4[] a)"))
  }

  test("decoded struct shapes (macro lib.rs:159-178, :201-206 parity)") {
    val e = EventSchema.parse(
      "Transfer(address indexed from, address indexed to, uint value)")
    assert(e.dataStruct.fieldNames.toSeq == Seq("from", "to", "value"))
    assert(e.fullStruct.fieldNames.toSeq ==
      Seq("block_number", "transaction_hash", "address", "log_index",
        "from", "to", "value"))
    assert(e.indexedParams.map(_.name) == Seq("from", "to"))
    assert(e.dataParams.map(_.name) == Seq("value"))
  }
}
