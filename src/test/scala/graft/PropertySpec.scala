package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, EventLog}

/** ScalaCheck properties from SURVEY §5: the flush partitions the key
  * space; merge order is invariant under source interleaving; sketch
  * kernels behave like their definitions on arbitrary inputs.
  * (Deterministic seeded sampling — scalatestplus isn't in the offline
  * dependency cache, so generators are driven directly.)
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 12)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private val genRows: Gen[List[(String, Long, Long, Int)]] =
    Gen.listOfN(40, for {
      src <- Gen.oneOf("a", "b", "c")
      blk <- Gen.choose(0L, 7L)
      idx <- Gen.choose(0L, 5L)
      v <- Gen.choose(0, 100)
    } yield (src, blk, idx, v))

  test("flushIncluding partitions the key space: every in-range event in " +
    "exactly one cell, empty cells everywhere else") {
    forAll(genRows) { rows =>
      whenever(rows.nonEmpty) {
        val distinct = rows.distinct
        val df = distinct.toDF("source", "block_number", "log_index", "value")
        val sources = Seq("a", "b", "c")
        val out = EventLog
          .flushIncluding(df, sources, 2L, 5L, Seq("value"), "source")
          .collect()
        // dense spine: 4 blocks × 3 sources
        assert(out.length == 12)
        val total = out.map(_.getSeq[Any](2).size).sum
        val expected = distinct.count { case (_, b, _, _) => b >= 2 && b <= 5 }
        assert(total == expected)
      }
    }
  }

  test("ordered merge invariant under stream interleaving and split") {
    forAll(genRows) { rows =>
      whenever(rows.nonEmpty) {
        // unique (block, idx) keys so the order is total
        val uniq = rows.groupBy(r => (r._2, r._3)).map(_._2.head).toSeq
        val df = uniq.toDF("source", "block_number", "log_index", "value")
        val bySource = Seq("a", "b", "c").map(s => df.filter($"source" === s))
        def run(streams: Seq[org.apache.spark.sql.DataFrame]) =
          EventLog.orderedMerge(streams, Seq("log_index"))
            .select("block_number", "pos_in_block", "log_index")
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
            .sortBy(x => (x._1, x._2)).toSeq
        assert(run(bySource) == run(bySource.reverse))
      }
    }
  }

  test("minhash estimate tracks exact Jaccard on synthetic doc pairs") {
    val gen = for {
      common <- Gen.choose(5, 40)
      extraA <- Gen.choose(0, 20)
      extraB <- Gen.choose(0, 20)
    } yield (common, extraA, extraB)
    forAll(gen) { case (common, extraA, extraB) =>
      val shared = (0 until common).map(i => s"w$i")
      val a = (shared ++ (0 until extraA).map(i => s"a$i")).mkString(" ")
      val b = (shared ++ (0 until extraB).map(i => s"b$i")).mkString(" ")
      val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      // 1-gram shingles make exact jaccard computable from the word sets
      val exact = {
        val sa = a.split(" ").toSet; val sb = b.split(" ").toSet
        (sa & sb).size.toDouble / (sa | sb).size
      }
      val est = Dedup.minHashLshPairs(df, n = 1, numHashes = 256,
          bands = 256, minJaccard = 0.0, storage = None) // looped: no cache leak
        .select("est_jaccard").as[Double].collect()
      assert(est.nonEmpty)
      assert(math.abs(est.head - exact) < 0.18, // 256 hashes ⇒ σ ≈ 0.03
        s"est ${est.head} vs exact $exact")
    }
  }

  test("ABI encode→decode roundtrips arbitrary u256 values and addresses") {
    import graft.model.{EventSchema, Hex}
    val schema = EventSchema.parse(
      "Transfer(address indexed from, address indexed to, uint value)")
    val genRow = for {
      id <- Gen.choose(0L, 1000L)
      addrBytes <- Gen.listOfN(20, Gen.choose(-128, 127).map(_.toByte))
      // values across the full u256 range incl. boundaries — above 1e38
      // the Decimal column nulls out and only the raw twin is lossless
      value <- Gen.oneOf(
        Gen.choose(0L, Long.MaxValue).map(BigInt(_)),
        Gen.const(BigInt(10).pow(38) - 1),
        Gen.choose(0L, Long.MaxValue).map(v => BigInt(v) * BigInt(v)),
        Gen.choose(1L, Long.MaxValue).map(v => BigInt(v) * BigInt(v) * BigInt(v)),
        Gen.const((BigInt(1) << 256) - 1))
    } yield (id, addrBytes.toArray, value)
    forAll(Gen.listOfN(8, genRow), n = 6) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.zipWithIndex.map { case ((id, addr, v), i) =>
          val valueWord = {
            val b = v.toByteArray.dropWhile(_ == 0)
            Array.fill[Byte](32 - b.length)(0) ++ b
          }
          (i.toLong, schema.topic0,
            Array.fill[Byte](12)(0) ++ addr,
            Array.fill[Byte](12)(0) ++ addr,
            valueWord)
        }.toDF("block_number", "topic0", "topic1", "topic2", "data")
          .withColumn("log_index", lit(0L))
          .withColumn("topic3", lit(null).cast("binary"))
        val out = graft.operators.EventDecoder.decode(df, schema)
          .select($"block_number", $"from", $"value".cast("string"), $"value_raw")
          .collect()
          .map(r => r.getLong(0) ->
            ((Option(r.getAs[Array[Byte]](1)).map(Hex.encode),
              Option(r.getString(2)),
              Option(r.getAs[Array[Byte]](3)))))
          .toMap
        rows.zipWithIndex.foreach { case ((_, addr, v), i) =>
          val (gotAddr, gotVal, gotRaw) = out(i.toLong)
          assert(gotAddr.contains(Hex.encode(addr)))
          if (v < BigInt(10).pow(38)) assert(gotVal.contains(v.toString))
          else assert(gotVal.isEmpty, "decimal must null out above 1e38")
          // the raw 32-byte twin is lossless across the whole u256 range
          assert(gotRaw.map(BigInt(1, _)).contains(v))
        }
      }
    }
  }

  test("string[] roundtrips arbitrary element lists through the dyn-tail kernel") {
    val genList: Gen[List[String]] = Gen.choose(0, 5).flatMap(k =>
      Gen.listOfN(k, Gen.choose(0, 80).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(
          Gen.alphaNumChar, Gen.const('é'), Gen.const('中'), Gen.const(' ')))
          .map(_.mkString))))
    // canonical ABI encoder for [head][n][off…][len payload…] tails
    def encode(xs: Seq[Array[Byte]]): Array[Byte] = {
      def word(v: Long): Array[Byte] = {
        val w = new Array[Byte](32)
        var x = v; var i = 31
        while (x != 0) { w(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
        w
      }
      def padded(b: Array[Byte]): Array[Byte] =
        b ++ Array.fill[Byte]((32 - b.length % 32) % 32)(0)
      val tails = xs.map(b => word(b.length) ++ padded(b))
      val offs = tails.scanLeft(xs.length.toLong * 32)(_ + _.length).init
      word(32) ++ word(xs.length) ++
        offs.flatMap(word).toArray ++ tails.flatten.toArray
    }
    forAll(genList, n = 30) { xs =>
      val blob = encode(xs.map(_.getBytes("UTF-8")))
      val out = graft.functions.AbiRuntime.dynTailArray(
        blob, 0, asString = true, fixedK = -1)
      assert(out != null)
      val got = (0 until out.numElements())
        .map(i => out.getUTF8String(i).toString)
      assert(got == xs)
    }
  }

  test("array-tail kernels never throw on arbitrary garbage blobs") {
    val genBlob: Gen[(Array[Byte], Int)] = for {
      len <- Gen.choose(0, 200)
      bytes <- Gen.listOfN(len, Gen.choose(-128, 127).map(_.toByte))
      headIdx <- Gen.choose(0, 3)
    } yield (bytes.toArray, headIdx)
    forAll(genBlob, n = 200) { case (blob, headIdx) =>
      // null array or clamped elements are both fine; an exception never is
      graft.functions.AbiRuntime.dynTailArray(blob, headIdx, asString = true, -1)
      graft.functions.AbiRuntime.dynTailArray(blob, headIdx, asString = false, 3)
      graft.functions.AbiRuntime.wordTailArray(blob, headIdx, signed = false)
      graft.functions.AbiRuntime.nestedWordTailArray(blob, headIdx, signed = true)
      graft.functions.AbiRuntime.wordTailSliceArray(blob, headIdx, 0)
      graft.functions.AbiRuntime.wordTailSliceArray(blob, headIdx, 2)
    }
  }

  test("orderedCumsum equals the naive per-group window on random data") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Sampling
    val genRows = Gen.listOfN(60, for {
      id <- Gen.choose(0L, 500L)
      g <- Gen.oneOf("x", "y")
      w <- Gen.choose(0L, 50L)
    } yield (id, g, w))
    forAll(genRows, n = 6) { rows =>
      whenever(rows.nonEmpty) {
        // ids must be unique within a group for a deterministic order
        val d = rows.distinctBy(r => (r._1, r._2)).toDF("id", "g", "w")
        val got = Sampling.orderedCumsum(d, expr("id div 32"),
          Seq(col("id")), col("w"), "cum", totalName = Some("n"),
          partCols = Seq("g")).select("g", "id", "cum", "n")
        val wspec = Window.partitionBy(col("g")).orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val expect = d
          .withColumn("cum", sum(col("w")).over(wspec))
          .withColumn("n", sum(col("w")).over(Window.partitionBy(col("g"))))
          .select("g", "id", "cum", "n")
        assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
      }
    }
  }

  test("zValue matches an independent bit-interleave on arbitrary inputs") {
    import graft.operators.Layout
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
      }
    val gen = Gen.listOfN(30, for {
      a <- Gen.choose(0L, 65535L)
      b <- Gen.choose(0L, 65535L)
    } yield (a, b))
    forAll(gen, n = 4) { pairs =>
      whenever(pairs.nonEmpty) {
        val got = pairs.toDF("a", "b")
          .select(col("a"), col("b"),
            Layout.zValue(col("a"), col("b"), 16).as("z"))
          .as[(Long, Long, Long)].collect()
        got.foreach { case (a, b, z) => assert(z == ref(a, b, 16)) }
      }
    }
  }

  test("bpeEncode: round trip and monotone shrinkage on arbitrary words/merges") {
    val genWord = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val genCase = for {
      words <- Gen.nonEmptyListOf(genWord)
      nMerges <- Gen.choose(0, 8)
    } yield (words.distinct, nMerges)
    forAll(genCase) { case (words, nMerges) =>
      val corpus = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val merges = graft.operators.TextOps.bpeTrainMerges(corpus, nMerges)
      val enc = words.toDF("w")
        .select($"w", graft.functions.vec.bpeEncode($"w", merges).as("t"))
        .as[(String, Seq[String])].collect()
      enc.foreach { case (w, toks) =>
        assert(toks.mkString("") == w, s"round trip broke for '$w'")
        assert(toks.nonEmpty && toks.length <= w.length)
        // every token is either a single char or a product of learned merges
        val vocab = merges.map { case (a, b) => a + b }.toSet
        toks.filter(_.length > 1).foreach(t =>
          assert(vocab.contains(t), s"token '$t' not in learned vocab"))
      }
    }
  }

  test("fixed-point decode roundtrips arbitrary scaled longs at any N") {
    // raw int64 two's-complement words at random scales: decode must
    // equal BigDecimal(raw, N) exactly — signed, zero, extremes
    val gen = for {
      raw <- Gen.oneOf(Gen.choose(Long.MinValue, Long.MaxValue),
        Gen.oneOf(0L, 1L, -1L, Long.MaxValue, Long.MinValue))
      n <- Gen.choose(1, 18)
    } yield (raw, n)
    forAll(gen, n = 16) { case (raw, n) =>
      val schema = graft.model.EventSchema.parse(
        s"F(ufixed128x$n a, fixed128x$n b)")
      val wordOf: Long => Array[Byte] = v =>
        BigInt(v).toByteArray.reverse
          .padTo(32, (if (v < 0) -1 else 0).toByte).reverse
      val pos = math.abs(math.max(raw, Long.MinValue + 1))
      val data = wordOf(pos) ++ wordOf(raw)
      val raws = Seq((1L, data)).toDF("id", "data")
        .withColumn("topic0", lit(schema.topic0))
        .withColumn("topic1", lit(null).cast("binary"))
        .withColumn("topic2", lit(null).cast("binary"))
        .withColumn("topic3", lit(null).cast("binary"))
        .withColumn("block_number", lit(1L))
        .withColumn("log_index", lit(0L))
      val row = graft.operators.EventDecoder.decode(raws, schema)
        .select($"a", $"b")
        .as[(Option[BigDecimal], Option[BigDecimal])].collect().head
      assert(row._1.get == BigDecimal(BigInt(pos), n),
        s"ufixed raw=$pos n=$n")
      assert(row._2.get == BigDecimal(BigInt(raw), n),
        s"fixed raw=$raw n=$n")
    }
  }

  test("simhash: hamming distance grows with symmetric difference") {
    val base = (0 until 30).map(i => s"w$i")
    val df = Seq(
      (1L, base.mkString(" ")),
      (2L, base.mkString(" ")),
      (3L, (base.drop(2) ++ Seq("x1", "x2")).mkString(" ")),
      (4L, (0 until 30).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val h = Dedup.simHash64(df).as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) == 0)
    assert(ham(h(1L), h(3L)) < ham(h(1L), h(4L)))
  }

  test("IndexedParamRewrite: rewritten comparisons are extensionally equal " +
    "to the decode on arbitrary words, scales, and operators") {
    import java.math.BigInteger
    def word(bi: BigInteger): Array[Byte] = {
      val out = new Array[Byte](32)
      val b = bi.toByteArray
      val n = math.min(b.length, 32)
      System.arraycopy(b, b.length - n, out, 32 - n, n)
      out
    }
    val max38 = new BigInteger("9" * 38)
    // raw magnitudes spanning decodable and null-decode (>38-digit) bands
    val genMag: Gen[BigInteger] = Gen.oneOf(
      Gen.choose(0L, 200L).map(BigInteger.valueOf),
      Gen.choose(0L, Long.MaxValue).map(BigInteger.valueOf),
      Gen.choose(0L, Long.MaxValue).map(v =>
        BigInteger.valueOf(v).multiply(BigInteger.TEN.pow(20))),
      Gen.const(max38), Gen.const(max38.add(BigInteger.ONE)),
      Gen.const(BigInteger.TWO.pow(254)))
    def genRaw(signed: Boolean): Gen[BigInteger] =
      if (!signed) genMag
      else for { m <- genMag; neg <- Gen.oneOf(true, false) }
        yield if (neg) m.negate else m
    val genCase = for {
      signed <- Gen.oneOf(true, false)
      raws <- Gen.listOfN(12, genRaw(signed))
      lit0 <- genRaw(signed)
      // nudge the literal off the exact grid sometimes (fractional /
      // off-by-one bounds are where floor/ceil arithmetic breaks)
      cents <- Gen.choose(0, 99)
      scale <- Gen.oneOf(0, 2)
      op <- Gen.choose(0, 4)
    } yield (signed, raws, lit0, cents, scale, op)

    forAll(genCase, n = 60) { case (signed, raws, lit0, cents, scale, op) =>
      def signedWord(bi: BigInteger): Array[Byte] = {
        val out = new Array[Byte](32)
        if (bi.signum < 0) java.util.Arrays.fill(out, 0xff.toByte)
        val b = bi.toByteArray
        val n = math.min(b.length, 32)
        System.arraycopy(b, b.length - n, out, 32 - n, n)
        out
      }
      val rows = raws.distinct.zipWithIndex.map { case (r, i) =>
        (Array.fill[Byte](20)(1: Byte), word(BigInteger.ZERO), signedWord(r),
          word(BigInteger.ZERO), null: Array[Byte], word(BigInteger.ZERO),
          i.toLong, null: Array[Byte], 0L, false)
      }
      val df = spark.createDataFrame(
        rows.toDF("address", "topic0", "topic1", "topic2", "topic3",
          "data", "block_number", "transaction_hash", "log_index",
          "removed").rdd, graft.model.LogSchema.struct)
      // literal value at the decode scale, with a fractional tail when
      // scale > 0 (cents) — BigDecimal(unscaled=lit0*100+cents, 2)
      val v =
        if (scale == 0) new java.math.BigDecimal(lit0)
        else new java.math.BigDecimal(
          lit0.multiply(BigInteger.valueOf(100))
            .add(BigInteger.valueOf(cents.toLong)), 2)
      // keep the literal inside Decimal(38, scale) or the lit() itself
      // overflows before the rewrite is even in play
      whenever(v.precision <= 38) {
        val decode =
          if (signed) graft.functions.abi.i256Scaled($"topic1", scale)
          else graft.functions.abi.u256Scaled($"topic1", scale)
        val pred = op match {
          case 0 => decode === lit(v)
          case 1 => decode > lit(v)
          case 2 => decode >= lit(v)
          case 3 => decode < lit(v)
          case 4 => decode <= lit(v)
        }
        val filtered = df.filter(pred)
        // the rewrite must fire (binary predicates, no decode left)
        assert(!filtered.queryExecution.optimizedPlan.toString
          .contains("256_to_decimal"), "rewrite did not fire")
        val got = filtered.select($"block_number").as[Long].collect().toSet
        val expect = raws.distinct.zipWithIndex.collect {
          case (r, i) if r.abs.compareTo(max38) <= 0 && {
            val dec = new java.math.BigDecimal(r, scale)
            val c = dec.compareTo(v)
            op match {
              case 0 => c == 0
              case 1 => c > 0
              case 2 => c >= 0
              case 3 => c < 0
              case 4 => c <= 0
            }
          } => i.toLong
        }.toSet
        assert(got == expect,
          s"signed=$signed op=$op scale=$scale v=$v " +
            s"raws=${raws.distinct.mkString(",")}")
      }
    }
  }

  private val genLineDocs: Gen[List[(Long, String)]] = {
    val genLine = Gen.oneOf(
      "shared banner", "common footer", "", " ",
      "alpha beta", "gamma delta", "epsilon", "zeta eta theta")
    Gen.listOfN(8, Gen.choose(0, 6).flatMap(k => Gen.listOfN(k, genLine)))
      .map(_.zipWithIndex.map { case (ls, i) => (i.toLong, ls.mkString("\n")) })
  }

  test("lineDedup: reference-model equality on arbitrary line corpora") {
    forAll(genLineDocs) { docs =>
      whenever(docs.nonEmpty) {
        val got = graft.operators.TextOps
          .lineDedup(docs.toDF("doc_id", "text"), minDocs = 2)
          .collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
          .toMap
        // reference model: a trimmed-nonblank line in >= 2 distinct docs
        // is removed everywhere; order and blanks preserved
        val split = docs.map { case (id, t) => id -> t.split("\n", -1).toSeq }
        val hot = split.flatMap { case (id, ls) =>
          ls.filter(_.trim.nonEmpty).distinct.map(l => (l, id))
        }.groupBy(_._1).collect {
          case (l, occ) if occ.map(_._2).distinct.size >= 2 => l
        }.toSet
        val expect = split.map { case (id, ls) =>
          val kept = ls.filterNot(hot)
          id -> ((kept.mkString("\n"), (ls.size - kept.size).toLong))
        }.toMap
        assert(got == expect)
      }
    }
  }

  test("tokenBudgetSelect: prefix-of-md5-order invariant for any budget") {
    val genDocs: Gen[List[(Long, String)]] = Gen.listOfN(15, for {
      id <- Gen.choose(0L, 200L)
      w <- Gen.choose(0, 9)
    } yield (id, List.fill(w)("tok").mkString(" ")))
    forAll(genDocs) { docs0 =>
      val docs = docs0.distinctBy(_._1)
      whenever(docs.nonEmpty) {
        val budget = 1L + docs.size // small: forces a mid-corpus cut
        val got = graft.operators.Sampling
          .tokenBudgetSelect(docs.toDF("doc_id", "text"), budget)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        // model: md5-ordered prefix until the budget line is crossed
        val md = java.security.MessageDigest.getInstance("MD5")
        def m(id: Long) = md.digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val ordered = docs.sortBy { case (id, _) => m(id) }
        val (expect, _) = ordered.foldLeft(
            (Vector.empty[(Long, Long, Long)], 0L)) {
          case ((acc, cum), (id, t)) =>
            val n = t.split("\\s+").count(_.nonEmpty).toLong
            if (cum < budget) (acc :+ ((id, n, cum + n)), cum + n)
            else (acc, cum + n)
        }
        // set compare: rows with equal cum (zero-token docs) have no
        // defined output order, so a sort on cum alone would be flaky
        assert(got.toSet == expect.toSet)
      }
    }
  }

  test("wsTokenHashes kernel is byte-exact with the transform+xxhash64 formulation") {
    // the fused kernel must reproduce split("\\s+")+filter+xxhash64
    // EXACTLY — persisted band indexes carry hashes of these tokens, so
    // any drift would poison every fixture-keyed index cache. Cases:
    // every \s separator, runs, leading/trailing ws, empties, multibyte
    // text, and non-\s unicode whitespace lookalikes (NBSP stays a
    // token character, exactly as in the regex formulation).
    val wsChars = Seq(' ', '\t', '\n', '\u000B', '\f', '\r')
    val genText: Gen[String] = Gen.listOfN(30, Gen.frequency(
      4 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(wsChars),
      1 -> Gen.oneOf('é', '中', ' ', 'ß', '€'),
      1 -> Gen.oneOf('.', ',', '-', '@'))).map(_.mkString)
    val texts = (0 until 40).flatMap(i =>
      genText.apply(Gen.Parameters.default, Seed(i.toLong))) ++
      Seq("", " ", "a", " a ", "\t\n", "a b", "中 文 字", "a\uD835\uDD4Fb c")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select($"id",
        graft.functions.vec.wsTokenHashes($"text").as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    val want = df.select($"id",
        transform(graft.operators.TextOps.wsTokens($"text"),
          w => xxhash64(w)).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    texts.indices.foreach { i =>
      assert(got(i.toLong) == want(i.toLong),
        s"mismatch on ${texts(i).map(_.toInt.toHexString)}: " +
          s"${got(i.toLong)} vs ${want(i.toLong)}")
    }
  }

  test("langStats kernel is value-exact with the split/regexp/filter " +
    "formulation it replaces") {
    // the fused kernel carries the langId/qualityScore/langQuality hot
    // path: votes = size(filter(wsTokens(lower), isin(words_j))), then
    // n_ws / n_bpe (regexp_extract_all "[a-z0-9]+|[^a-z0-9\s]") /
    // n_punct (bpe tokens matching ^[^a-z0-9]$). Cases: every \s
    // separator, stopwords of all five lists (incl. multibyte zh),
    // unicode ws lookalikes (NBSP is a token char), punctuation runs,
    // supplementary codepoints, uppercase (lower() applies above the
    // kernel), empty/ws-only strings.
    val wsChars = Seq(' ', '\t', '\n', '\u000B', '\f', '\r')
    val stops = graft.operators.TextOps.StopWords
    val genText: Gen[String] = Gen.listOfN(14, Gen.frequency(
      3 -> Gen.oneOf(stops.flatMap(_._2)),
      3 -> Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString),
      2 -> Gen.oneOf(wsChars).map(_.toString),
      1 -> Gen.oneOf("é", "中", " ", "ß", "€", "𝕏", "的"),
      1 -> Gen.oneOf(".", ",,", "--", "@", "a.b", "Ab,C"))).map(_.mkString(" "))
    val texts = (0 until 40).flatMap(i =>
      genText.apply(Gen.Parameters.default, Seed(1000 + i.toLong))) ++
      Seq("", " ", "the", "THE", "der die das", "的 是 了", "a.b,c",
        "...", "a𝕏b c", "\t\n", " the\tla 的 ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select($"id",
        graft.functions.vec.langStats(lower($"text"), stops.map(_._2))
          .as("st"))
      .as[(Long, Seq[Long])].collect().toMap
    val toks = filter(split(lower($"text"), "\\s+"), t => t =!= "")
    val bpe = regexp_extract_all(lower($"text"),
      lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))
    val voteCols = stops.map { case (_, ws) =>
      size(filter(toks, t => t.isin(ws.map(lit(_)): _*))).cast("bigint")
    }
    val want = df.select($"id", array(voteCols ++ Seq(
        size(toks).cast("bigint"),
        size(bpe).cast("bigint"),
        size(filter(bpe, t => t.rlike("^[^a-z0-9]$"))).cast("bigint")): _*)
        .as("st"))
      .as[(Long, Seq[Long])].collect().toMap
    texts.indices.foreach { i =>
      assert(got(i.toLong) == want(i.toLong),
        s"mismatch on '${texts(i)}' (${texts(i).map(_.toInt.toHexString)}): " +
          s"${got(i.toLong)} vs ${want(i.toLong)}")
    }
  }

  test("lshBandKeys kernel is byte-exact with the transform+slice+xxhash64 formulation") {
    // band keys live in persisted index caches — the compiled fold must
    // reproduce Spark's XxHash64 over (band_idx, slice) exactly
    val genSig: Gen[List[Long]] = Gen.listOfN(64, Gen.choose(Long.MinValue, Long.MaxValue))
    val sigs = (0 until 20).flatMap(i =>
      genSig.apply(Gen.Parameters.default, Seed(i.toLong)))
    val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "sig")
    Seq((16, 4), (8, 8), (1, 64), (64, 1)).foreach { case (bands, r) =>
      val got = df.select($"id",
          graft.functions.vec.lshBandKeys($"sig", bands, r).as("k"))
        .as[(Long, Seq[Long])].collect().toMap
      val want = df.select($"id",
          transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(b, slice($"sig", b * r + lit(1), lit(r)))).as("k"))
        .as[(Long, Seq[Long])].collect().toMap
      sigs.indices.foreach { i =>
        assert(got(i.toLong) == want(i.toLong),
          s"bands=$bands r=$r row $i: ${got(i.toLong)} vs ${want(i.toLong)}")
      }
    }
  }

  test("from-index pair serving equals the direct LSH run on arbitrary corpora") {
    val words = Vector("ab", "cd", "ef", "gh", "ij", "kl")
    val genDocs: Gen[List[(Long, String)]] = Gen.listOfN(12, for {
      id <- Gen.choose(0L, 40L)
      n <- Gen.choose(0, 8)
      ws <- Gen.listOfN(n, Gen.oneOf(words))
    } yield (id, ws.mkString(" ")))
    forAll(genDocs, n = 8) { docs0 =>
      val docs = docs0.distinctBy(_._1)
      whenever(docs.nonEmpty) {
        val df = docs.toDF("doc_id", "text")
        def key(r: org.apache.spark.sql.Row) =
          (r.getLong(0), r.getLong(1), r.getDouble(2))
        val direct = Dedup.minHashLshPairs(df, n = 2, numHashes = 16,
          bands = 8, minJaccard = 0.3, storage = None)
          .collect().map(key).toSet
        val served = Dedup.minHashLshPairsFromIndex(
          Dedup.minHashBandIndex(df, n = 2, numHashes = 16, bands = 8),
          minJaccard = 0.3)
          .collect().map(key).toSet
        assert(served == direct, s"served $served != direct $direct")
        // an occupancy cap no bucket reaches is the identity
        val capped = Dedup.minHashLshPairsFromIndex(
          Dedup.minHashBandIndex(df, n = 2, numHashes = 16, bands = 8),
          minJaccard = 0.3, maxBucketSize = Some(docs.size + 1))
          .collect().map(key).toSet
        assert(capped == direct, s"identity cap dropped pairs: $capped != $direct")
      }
    }
  }

  test("densityPrune equals the brute per-cluster reference on random vectors") {
    import graft.operators.Similarity
    // centroid components exact multiples of 0.25 (the oracle contract)
    val cents = Array(Array(0.5, -0.25, 1.0), Array(-0.75, 0.25, 0.0),
      Array(0.0, 1.0, -0.5))
    val genVecs: Gen[List[Array[Float]]] = Gen.listOfN(60,
      Gen.listOfN(3, Gen.choose(-1000, 1000).map(_ / 256.0f)).map(_.toArray))
    // the operator's arithmetic, replicated scalar-for-scalar: per-element
    // float→double products, left-associated sums, plan-time-exact ‖c‖²,
    // assignment ties to the smaller cluster index
    def ref(v: Array[Float], c: Array[Double]): (Double, Double) = {
      var vv = 0.0; var dot = 0.0; var i = 0
      while (i < v.length) {
        vv += v(i).toDouble * v(i).toDouble
        dot += v(i).toDouble * c(i); i += 1
      }
      val key = c.map(x => x * x).sum - 2.0 * dot
      (key, vv + key)
    }
    for (keepHardest <- Seq(true, false)) forAll(genVecs, n = 6) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val assigned = rows.map { case (id, v) =>
        val keys = cents.map(c => ref(v, c))
        val cl = keys.map(_._1).zipWithIndex.minBy { case (k, j) => (k, j) }._2
        (id, cl, keys(cl)._2)
      }
      val expect = assigned.groupBy(_._2).flatMap { case (cl, rs) =>
        // decimal quota semantics: BigDecimal("0.3") · n, ceil
        val quota = new java.math.BigDecimal("0.3")
          .multiply(new java.math.BigDecimal(rs.size))
          .setScale(0, java.math.RoundingMode.CEILING).intValueExact()
        val ordered =
          if (keepHardest) rs.sortBy { case (id, _, d) => (-d, id) }
          else rs.sortBy { case (id, _, d) => (d, id) }
        ordered.take(quota).map { case (id, c, _) => (id, c) }
      }.toSet
      val got = Similarity.densityPrune(rows.toDF("vec_id", "embedding"),
          cents, keepFrac = 0.3, keepHardest = keepHardest)
        .as[(Long, Int)].collect().toSet
      assert(got == expect,
        s"keepHardest=$keepHardest: ${got.diff(expect)} vs ${expect.diff(got)}")
    }
  }

  // ---- round-14 multimodal kernels (pure-JVM PPM/WAV parse paths) ----

  private def ppmOf(w: Int, h: Int, px: Int => Int): Array[Byte] = {
    val hdr = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    hdr ++ Array.tabulate(w * h * 3)(i => px(i).toByte)
  }

  private val genImage: Gen[Array[Byte]] = for {
    w <- Gen.choose(1, 16)
    h <- Gen.choose(1, 16)
    seed <- Gen.choose(0, 1 << 20)
  } yield ppmOf(w, h, i => (i * 2654435761L + seed).toInt & 0xff)

  test("ppmResize: identity dims re-encode the exact body; any resize " +
    "output is itself a decodable PPM (composition closure)") {
    def resize(p: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
      val r = Seq(Tuple1(p)).toDF("payload")
        .select(graft.functions.vec.ppmResize($"payload", w, h).as("r"))
        .collect().head
      if (r.isNullAt(0)) None else Some(r.getAs[Array[Byte]](0))
    }
    forAll(genImage, n = 8) { p =>
      // parse dims back out of the canonical fixture header (line 2)
      val Array(w, h) = new String(p.take(20), "US-ASCII")
        .split("\n")(1).split(" ").map(_.toInt)
      val same = resize(p, w, h).get
      // identity resize: every box is exactly one source pixel → the
      // body is byte-identical under the canonical header
      assert(same.drop(s"P6\n$w $h\n255\n".length)
        .sameElements(p.drop(s"P6\n$w $h\n255\n".length)),
        s"identity resize changed the body at ${w}x$h")
      // closure: any target dims produce a payload the decoder accepts
      for ((ow, oh) <- Seq((1, 1), (3, 5), (2 * w, h), (9, 8))) {
        val out = resize(p, ow, oh).get
        val bands = Seq(Tuple1(out)).toDF("p")
          .select(graft.functions.vec.dHashImageBands($"p", 4, 16).isNull)
          .collect().head.getBoolean(0)
        assert(!bands, s"resize to ${ow}x$oh not decodable from ${w}x$h")
      }
    }
  }

  private def wavOf(samples: Seq[Int], channels: Int): Array[Byte] = {
    val dataLen = samples.length * channels
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort)
      .putInt(8000).putInt(8000 * channels)
      .putShort(channels.toShort).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => (0 until channels).foreach(_ => b.put(s.toByte)))
    b.array()
  }

  test("wavFingerprint64: invariant under duplicating the waveform " +
    "across identical channels (mix-down property)") {
    def fp(p: Array[Byte]): Long = {
      val r = Seq(Tuple1(p)).toDF("payload")
        .select(graft.functions.vec.audioFingerprint64($"payload").as("f"))
        .collect().head
      assert(!r.isNullAt(0), "fixture WAV failed to parse")
      r.getLong(0)
    }
    val genSamples = for {
      n <- Gen.choose(2, 200)
      seed <- Gen.choose(0, 1 << 20)
    } yield Seq.tabulate(n)(i => ((i * 1103515245L + seed) >>> 7).toInt & 0xff)
    forAll(genSamples, n = 8) { samples =>
      val mono = fp(wavOf(samples, 1))
      for (ch <- Seq(2, 3, 4))
        assert(fp(wavOf(samples, ch)) == mono,
          s"$ch identical channels must mix to the mono fingerprint")
    }
  }

  test("ppmFrameDHashes: hashing a concatenation equals each frame's " +
    "still-image hash, including the even-sampling branch past maxFrames") {
    def frameHashes(p: Array[Byte], maxFrames: Int): Seq[Long] = {
      val r = Seq(Tuple1(p)).toDF("payload")
        .select(graft.functions.vec.videoFrameDHashes($"payload", maxFrames)
          .as("h"))
        .collect().head
      assert(!r.isNullAt(0), "fixture video failed to parse")
      r.getSeq[Long](0)
    }
    def still64(p: Array[Byte]): Long = {
      val b = Seq(Tuple1(p)).toDF("p")
        .select(graft.functions.vec.dHashImageBands($"p", 4, 16).as("b"))
        .collect().head.getSeq[Long](0)
      b.zipWithIndex.map { case (v, i) => v << (i * 16) }.reduce(_ | _)
    }
    val genFrames = Gen.choose(1, 7).flatMap(Gen.listOfN(_, genImage))
    forAll(genFrames, n = 6) { frames =>
      val vid = frames.reduce(_ ++ _)
      val nf = frames.length
      // below the cap: every frame in order
      assert(frameHashes(vid, 8) == frames.map(still64),
        "concatenated frame hashes must equal the still-image hashes")
      // above the cap: the kernel samples frame ⌊i·nf/take⌋ for
      // i < take — replicate the sampling and compare
      for (take <- 1 to math.min(3, nf)) {
        val expect = (0 until take)
          .map(i => still64(frames((i * nf) / take)))
        assert(frameHashes(vid, take) == expect,
          s"even sampling diverged at take=$take of $nf frames")
      }
    }
  }

  test("y4m: frame hashes equal the gray concatenated-PPM twin across " +
    "random even geometry, colorspaces, and frame counts") {
    def frameHashes(p: Array[Byte]): Seq[Long] = {
      val r = Seq(Tuple1(p)).toDF("payload")
        .select(graft.functions.vec.videoFrameDHashes($"payload", 8).as("h"))
        .collect().head
      assert(!r.isNullAt(0), "fixture video failed to parse")
      r.getSeq[Long](0)
    }
    val genCase = for {
      w <- Gen.choose(1, 8).map(_ * 2)
      h <- Gen.choose(1, 8).map(_ * 2)
      nf <- Gen.choose(1, 5)
      cs <- Gen.oneOf("C420", "C444", "Cmono")
      seed <- Gen.choose(0, 1 << 20)
    } yield (w, h, nf, cs, seed)
    forAll(genCase, n = 8) { case (w, h, nf, cs, seed) =>
      def yPlane(f: Int): Array[Byte] = Array.tabulate(w * h)(i =>
        ((i * 2654435761L + seed + f * 977L).toInt & 0xff).toByte)
      val chroma = cs match {
        case "C420"  => 2 * ((w / 2) * (h / 2))
        case "C444"  => 2 * w * h
        case "Cmono" => 0
      }
      val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 $cs\n"
        .getBytes("US-ASCII")
      val y4m = (0 until nf).foldLeft(header) { (acc, f) =>
        acc ++ "FRAME\n".getBytes("US-ASCII") ++ yPlane(f) ++
          Array.fill(chroma)(((seed + f) & 0xff).toByte)
      }
      // the gray RGB rendering of each Y plane (R=G=B=Y ⇒ integer
      // luma = Y exactly) concatenated as the PPM twin
      val twin = (0 until nf).map { f =>
        val y = yPlane(f)
        ppmOf(w, h, i => y(i / 3) & 0xff)
      }.reduce(_ ++ _)
      assert(frameHashes(y4m) == frameHashes(twin),
        s"Y4M vs gray-PPM diverged at ${w}x$h $cs x$nf")
    }
  }

  test("imageToPpm ∘ ppmToPng: byte-exact round-trip and hash " +
    "preservation for random images (lossless closure)") {
    forAll(genImage, n = 8) { p =>
      val row = Seq(Tuple1(p)).toDF("payload")
        .select(
          graft.functions.vec.imageToPpm(
            graft.functions.vec.ppmToPng($"payload")).as("back"),
          graft.functions.vec.dHashImageBands(
            graft.functions.vec.ppmToPng($"payload"), 4, 16).as("hpng"),
          graft.functions.vec.dHashImageBands($"payload", 4, 16).as("hppm"))
        .collect().head
      assert(!row.isNullAt(0), "PNG round-trip failed to decode")
      assert(row.getAs[Array[Byte]](0).sameElements(p),
        "PNG → canonical P6 must reproduce the exact original bytes")
      assert(row.getSeq[Long](1) == row.getSeq[Long](2),
        "PNG and PPM of the same pixels must hash identically")
    }
  }

  test("wavToFloat32: the float re-encode parses for any PCM input and " +
    "fingerprints within the rounding-tie bound") {
    val genWav = for {
      n <- Gen.choose(2, 200)
      ch <- Gen.choose(1, 3)
      seed <- Gen.choose(0, 1 << 20)
    } yield wavOf(
      Seq.tabulate(n)(i => ((i * 1103515245L + seed) >>> 7).toInt & 0xff), ch)
    forAll(genWav, n = 8) { p =>
      val row = Seq(Tuple1(p)).toDF("payload")
        .select(
          graft.functions.vec.audioFingerprint64($"payload").as("fi"),
          graft.functions.vec.audioFingerprint64(
            graft.functions.vec.wavToFloat32($"payload")).as("ff"))
        .collect().head
      assert(!row.isNullAt(0) && !row.isNullAt(1),
        "float32 re-encode must parse")
      val ham = java.lang.Long.bitCount(row.getLong(0) ^ row.getLong(1))
      assert(ham <= 6, s"float re-encode drifted to hamming $ham")
    }
  }
}
