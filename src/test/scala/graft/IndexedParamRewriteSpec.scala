package graft

import java.math.BigInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.abi
import graft.model.LogSchema
import graft.sources.{RpcLogSource, SimEthNode}

/** [[graft.plans.IndexedParamRewrite]]: filters on DECODED indexed params
  * land on the raw topic words — and from there into parquet row-group
  * pruning and the `rpc-logs` DSv2 `eth_getLogs` translation. Semantics
  * are pinned against scala-side reference filters over fixtures that
  * include the decode's null corners (>38-digit raws, null topics).
  */
class IndexedParamRewriteSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def word(bi: BigInteger): Array[Byte] = {
    val out = new Array[Byte](32)
    if (bi.signum < 0) java.util.Arrays.fill(out, 0xff.toByte)
    val b = bi.toByteArray
    val n = math.min(b.length, 32)
    System.arraycopy(b, b.length - n, out, 32 - n, n)
    out
  }
  private def word(v: Long): Array[Byte] = word(BigInteger.valueOf(v))

  /** Values whose decode exercises every branch: zero, small, the
    * 38-nines max, a 39-digit raw (decode → null), ~2^200 (61 digits,
    * decode → null), plus a NULL topic row.
    */
  private val max38 = new BigInteger("9" * 38)
  private val rawValues: Seq[BigInteger] = Seq(
    BigInteger.ZERO, BigInteger.valueOf(1), BigInteger.valueOf(5),
    BigInteger.valueOf(77), BigInteger.valueOf(Long.MaxValue),
    max38, max38.add(BigInteger.ONE), BigInteger.TWO.pow(200))

  /** Canonical-log-schema parquet (so the leaf gate accepts it), topic1 =
    * the value word, one extra row with topic1 NULL.
    */
  private lazy val logParquet: String = {
    val dir = TestSpark.tempDir("ipr_logs")
    val rows = rawValues.zipWithIndex.map { case (v, i) =>
      (Array.fill[Byte](20)(0xaa.toByte), word(0L), word(v), word(0L),
        null: Array[Byte], word(v), i.toLong, null: Array[Byte], 0L, false)
    } :+ ((Array.fill[Byte](20)(0xaa.toByte), word(0L), null: Array[Byte],
      word(0L), null: Array[Byte], word(0L), 99L, null: Array[Byte], 0L,
      false))
    spark.createDataFrame(rows.toDF(
      "address", "topic0", "topic1", "topic2", "topic3", "data",
      "block_number", "transaction_hash", "log_index", "removed").rdd,
      LogSchema.struct).write.mode("overwrite").parquet(dir)
    dir
  }

  private def logs: DataFrame = spark.read.schema(LogSchema.struct).parquet(logParquet)

  private def decodable(v: BigInteger): Boolean =
    v.abs.compareTo(max38) <= 0

  private def blocksOf(df: DataFrame): Set[Long] =
    df.select($"block_number").as[Long].collect().toSet

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def pushedParquet(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("equality on u256(topic1) rewrites to binary equality and reaches " +
      "parquet PushedFilters") {
    val df = logs.filter(abi.u256($"topic1") === lit(77))
    val opt = optimized(df)
    assert(!opt.contains("u256_to_decimal"), s"decode survived: $opt")
    assert(blocksOf(df) == Set(3L))
    val plan = pushedParquet(df)
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(topic1"),
      s"no parquet pushdown: $plan")
  }

  test("range predicates rewrite to lexicographic word bounds, capped at " +
      "the 38-nines word (null-decode raws stay excluded)") {
    // > 5: decodable values above 5; the 39-digit and 2^200 raws decode to
    // null and must NOT appear even though their words sort above
    val gt = logs.filter(abi.u256($"topic1") > lit(5))
    assert(!optimized(gt).contains("u256_to_decimal"))
    val expectGt = rawValues.zipWithIndex.collect {
      case (v, i) if decodable(v) && v.compareTo(BigInteger.valueOf(5)) > 0 =>
        i.toLong
    }.toSet
    assert(blocksOf(gt) == expectGt, "strict lower bound")
    assert(pushedParquet(gt).contains("GreaterThanOrEqual(topic1"),
      "range did not reach parquet stats")

    val le = logs.filter(abi.u256($"topic1") <= lit(77))
    val expectLe = rawValues.zipWithIndex.collect {
      case (v, i) if decodable(v) && v.compareTo(BigInteger.valueOf(77)) <= 0 =>
        i.toLong
    }.toSet
    assert(blocksOf(le) == expectLe, "upper bound")

    // >= 0 keeps every decodable word but still excludes null-decode raws
    val ge0 = logs.filter(abi.u256($"topic1") >= lit(0))
    assert(blocksOf(ge0) ==
      rawValues.zipWithIndex.collect { case (v, i) if decodable(v) => i.toLong }.toSet)
  }

  test("IN-lists rewrite; unrepresentable literals fold to false") {
    val in = logs.filter(abi.u256($"topic1")
      .isin(1, 77, -3)) // -3: no unsigned word decodes to it — dropped
    assert(!optimized(in).contains("u256_to_decimal"))
    assert(blocksOf(in) == Set(1L, 3L))

    // equality with a fractional value: no word decodes to 1.5 — the
    // whole conjunct folds to an empty scan
    val frac = logs.filter(abi.u256($"topic1").cast("decimal(38,1)") ===
      lit(new java.math.BigDecimal("1.5")))
    assert(blocksOf(frac) == Set.empty[Long])
    // negative literal on the unsigned decode: also empty
    assert(blocksOf(logs.filter(abi.u256($"topic1") === lit(-1))) ==
      Set.empty[Long])
  }

  test("i256: equality on a negative value rewrites to the sign-extended " +
      "word; ranges rewrite to per-sign-band byte ranges") {
    val dir = TestSpark.tempDir("ipr_signed")
    val vals = Seq(-5L, -1L, 0L, 7L)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (Array.fill[Byte](20)(0xaa.toByte), word(0L), word(v), word(0L),
        null: Array[Byte], word(0L), i.toLong, null: Array[Byte], 0L, false)
    }
    spark.createDataFrame(rows.toDF(
      "address", "topic0", "topic1", "topic2", "topic3", "data",
      "block_number", "transaction_hash", "log_index", "removed").rdd,
      LogSchema.struct).write.mode("overwrite").parquet(dir)
    val signed = spark.read.schema(LogSchema.struct).parquet(dir)

    val eq = signed.filter(abi.i256($"topic1") === lit(-5))
    assert(!optimized(eq).contains("i256_to_decimal"), optimized(eq))
    assert(blocksOf(eq) == Set(0L))

    // zero-spanning range → Or of a negative band and a positive band,
    // no decode left in the plan
    val range = signed.filter(abi.i256($"topic1") > lit(-2))
    assert(!optimized(range).contains("i256_to_decimal"), optimized(range))
    assert(blocksOf(range) == Set(1L, 2L, 3L))
    // purely-negative band
    val neg = signed.filter(abi.i256($"topic1") <= lit(-1) &&
      abi.i256($"topic1") >= lit(-5))
    assert(!optimized(neg).contains("i256_to_decimal"), optimized(neg))
    assert(blocksOf(neg) == Set(0L, 1L))
    // purely-positive band over the signed decode
    val pos = signed.filter(abi.i256($"topic1") > lit(0))
    assert(blocksOf(pos) == Set(3L))
  }

  test("soundness gates: NOT/OR positions, non-leaf topics, and " +
      "non-canonical schemas are never rewritten") {
    // under NOT, null-vs-false diverge — must stay on the decode
    val notF = logs.filter(!(abi.u256($"topic1") === lit(77)))
    assert(optimized(notF).contains("u256_to_decimal"), optimized(notF))
    // null-decode and null rows drop under NOT(EqualTo) too (null ≠ true)
    assert(blocksOf(notF) ==
      rawValues.zipWithIndex.collect {
        case (v, i) if decodable(v) && v.longValue != 77 => i.toLong
      }.toSet)

    // a disjunct (non-conjunct position) stays untouched
    val or = logs.filter(abi.u256($"topic1") === lit(77) ||
      $"block_number" === 0L)
    assert(optimized(or).contains("u256_to_decimal"))
    assert(blocksOf(or) == Set(0L, 3L))

    // topic1 synthesized mid-plan (not a canonical-log leaf column):
    // the 32-byte invariant is unknowable — no rewrite
    val synth = spark.range(3)
      .withColumn("topic1",
        when($"id" === 1, lit(word(7L))).otherwise(lit(Array[Byte](7))))
    val synthF = synth.filter(abi.u256($"topic1") === lit(7))
    assert(synthF.queryExecution.optimizedPlan.toString
      .contains("u256_to_decimal"))
    // the 1-byte 0x07 array decodes to 7 — proof the gate matters
    assert(synthF.select($"id").as[Long].collect().toSet == Set(0L, 1L, 2L))

    // a LEAF without the full canonical schema (no `data` column): the
    // 32-byte contract doesn't attach — no rewrite. (Merely .drop()ing
    // columns off a canonical leaf keeps the rewrite: the leaf relation
    // still carries the contract.)
    val dir = TestSpark.tempDir("ipr_partial")
    logs.drop("data").write.mode("overwrite").parquet(dir)
    val pf = spark.read.parquet(dir).filter(abi.u256($"topic1") === lit(77))
    assert(optimized(pf).contains("u256_to_decimal"), optimized(pf))
    assert(blocksOf(pf) == Set(3L))

    // dropping `data` off the canonical leaf, by contrast, still rewrites
    val dropped = logs.drop("data").filter(abi.u256($"topic1") === lit(77))
    assert(!optimized(dropped).contains("u256_to_decimal"), optimized(dropped))
    assert(blocksOf(dropped) == Set(3L))
  }

  test("widening decimal cast over the decode still rewrites; the " +
      "rewrite survives projections and joins above the leaf") {
    val cast = logs.filter(abi.u256($"topic1").cast("decimal(38,2)") ===
      lit(new java.math.BigDecimal("77.00")))
    assert(!optimized(cast).contains("u256_to_decimal"), optimized(cast))
    assert(blocksOf(cast) == Set(3L))

    val dim = Seq((3L, "x"), (5L, "y")).toDF("bn", "tag")
    val joined = logs.select($"topic1", $"block_number")
      .join(dim, $"block_number" === $"bn")
      .filter(abi.u256($"topic1") === lit(77))
    assert(!optimized(joined).contains("u256_to_decimal"), optimized(joined))
    assert(joined.select($"tag").as[String].collect().toSeq == Seq("x"))
  }

  test("range under a scale-widening cast clamps to the cast target's " +
      "representable range (overflow rows never leak through the rewrite)") {
    // The (38,0)→(38,2) cast caps integer digits at 36: raw 10^37 decodes
    // fine but its cast overflows (LEGACY → null → filter-false; ANSI →
    // throws, which the pushdown short-circuits). The rewrite must keep
    // {7} only — before the castCapRaw clamp it also kept 10^37.
    val dir = TestSpark.tempDir("ipr_castcap")
    val vals = Seq(BigInteger.valueOf(7), BigInteger.TEN.pow(37))
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (Array.fill[Byte](20)(0xaa.toByte), word(0L), word(v), word(0L),
        null: Array[Byte], word(0L), i.toLong, null: Array[Byte], 0L, false)
    }
    spark.createDataFrame(rows.toDF(
      "address", "topic0", "topic1", "topic2", "topic3", "data",
      "block_number", "transaction_hash", "log_index", "removed").rdd,
      LogSchema.struct).write.mode("overwrite").parquet(dir)
    val caps = spark.read.schema(LogSchema.struct).parquet(dir)

    val gt = caps.filter(abi.u256($"topic1").cast("decimal(38,2)") >
      lit(new java.math.BigDecimal("5.5")))
    assert(!optimized(gt).contains("u256_to_decimal"), optimized(gt))
    assert(blocksOf(gt) == Set(0L), "cast-overflow row leaked through")

    // un-cast decode over the same data: 10^37 IS decodable and must stay
    val raw = caps.filter(abi.u256($"topic1") >
      lit(new java.math.BigDecimal("5.5")))
    assert(!optimized(raw).contains("u256_to_decimal"))
    assert(blocksOf(raw) == Set(0L, 1L))

    // signed twin: cast overflow on the negative side
    val sdir = TestSpark.tempDir("ipr_castcap_signed")
    val svals = Seq(BigInteger.valueOf(-7), BigInteger.TEN.pow(37).negate)
    val srows = svals.zipWithIndex.map { case (v, i) =>
      (Array.fill[Byte](20)(0xaa.toByte), word(0L), word(v), word(0L),
        null: Array[Byte], word(0L), i.toLong, null: Array[Byte], 0L, false)
    }
    spark.createDataFrame(srows.toDF(
      "address", "topic0", "topic1", "topic2", "topic3", "data",
      "block_number", "transaction_hash", "log_index", "removed").rdd,
      LogSchema.struct).write.mode("overwrite").parquet(sdir)
    val scaps = spark.read.schema(LogSchema.struct).parquet(sdir)
    val lt = scaps.filter(abi.i256($"topic1").cast("decimal(38,2)") <
      lit(new java.math.BigDecimal("-5.5")))
    assert(!optimized(lt).contains("i256_to_decimal"), optimized(lt))
    assert(blocksOf(lt) == Set(0L), "signed cast-overflow row leaked")
  }

  test("rpc-logs: u256(topic2) equality pushes through the rewrite into " +
      "the eth_getLogs positional slot filter") {
    RpcLogSource.registerTransport("ipr_rpc",
      new SimEthNode(head = 20L, logsPerBlock = 2, topicsPerLog = 3))
    val df = spark.read.format("graft.sources.RpcLogProvider")
      .option("transport", "ipr_rpc").option("confirmations", "0")
      .option("fetchBlocks", "21").load()
      .filter(abi.u256($"topic2") === lit(3)) // fixture: topic2 = word(b % 5)
    val plan = pushedParquet(df)
    assert(plan.contains("EqualTo(topic2,"), s"slot filter not pushed: $plan")
    val rows = df.select($"block_number", $"log_index").as[(Long, Long)]
      .collect().toSet
    val expected = (0L to 20L).filter(_ % 5 == 3)
      .flatMap(b => Seq((b, 0L), (b, 1L))).toSet
    assert(rows == expected)
  }
}
