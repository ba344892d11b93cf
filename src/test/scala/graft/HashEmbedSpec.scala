package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Similarity, TextOps}

/** Hashing-trick text embedding ([[graft.functions.HashEmbedVec]] /
  * [[TextOps.hashEmbed]]): kernel arithmetic pinned against an
  * independent reference fold, codepoint (BMP) semantics, the unit-float
  * adapter's geometry, and the end-to-end retrieval sanity the
  * sim_*_text_embed queries rely on.
  */
class HashEmbedSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // the PropertySpec convention: scalatestplus isn't in the offline
  // cache, so generators are driven directly with seeded draws
  private def forAll[A](gen: Gen[A], n: Int = 20)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  /** Independent reference: the documented math, written as the naive
    * per-window recompute (the kernel slides a rolling code — same
    * values, different algorithm, so a rolling-update bug can't hide).
    */
  private def reference(s: String, n: Int, dim: Int): Array[Long] = {
    val cps = s.codePoints().toArray
    val out = new Array[Long](dim)
    for (start <- 0 to cps.length - n) {
      var hg = 0L
      for (j <- 0 until n) hg = hg * 65536L + cps(start + j)
      val mix = (hg * 31L + 7L) % 1000003L
      out((mix % dim).toInt) += (if ((mix / dim) % 2L == 0L) 1L else -1L)
    }
    out
  }

  private def kernel(s: String, n: Int = 3, dim: Int = 64): Array[Long] =
    Seq(s).toDF("text")
      .select(graft.functions.vec.hashEmbedVec(col("text"), n, dim).as("v"))
      .head.getSeq[Long](0).toArray

  test("kernel matches the independent reference fold (ASCII + BMP CJK)") {
    for (s <- Seq("", "a", "ab", "abc", "abcd", "hello hash world",
        "数据处理引擎测试", "mixed 中文 and english text",
        "aaaaaaaaaa", "the quick brown fox jumps over the lazy dog"))
      for (n <- 1 to 3; dim <- Seq(2, 8, 64))
        assert(kernel(s, n, dim).toSeq == reference(s, n, dim).toSeq,
          s"mismatch for s='$s' n=$n dim=$dim")
  }

  test("property: kernel == reference on random BMP strings; mass = gram count") {
    // printable ASCII + a band of CJK — BMP only, the documented contract
    val cpGen = Gen.frequency(
      8 -> Gen.choose(32, 126), 2 -> Gen.choose(0x4e00, 0x4eff))
    val strGen = Gen.listOf(cpGen).map(_.map(_.toChar).mkString)
    forAll(strGen) { s =>
      val k = kernel(s)
      assert(k.toSeq == reference(s, 3, 64).toSeq)
      // every gram lands in exactly one slot with weight ±1, so total
      // SIGNED mass ≡ gram count (mod 2) and |mass| ≤ gram count
      val grams = math.max(s.codePoints().count().toInt - 2, 0)
      assert(k.map(math.abs).sum <= grams)
      assert(((k.sum - grams) % 2 + 2) % 2 == 0)
    }
  }

  test("short strings embed to the zero vector; n<=3 and dim>=2 enforced") {
    assert(kernel("ab").forall(_ == 0L))
    assert(kernel("").forall(_ == 0L))
    intercept[IllegalArgumentException] {
      graft.functions.vec.hashEmbedVec(col("text"), 4, 64)
    }
    intercept[IllegalArgumentException] {
      graft.functions.vec.hashEmbedVec(col("text"), 3, 1)
    }
  }

  test("hashEmbed is case-folded and deterministic; unit form is unit-norm") {
    val docs = Seq((0L, "The Quick Brown Fox"), (1L, "the quick brown fox"),
      (2L, "totally different payload"), (3L, "ab")).toDF("doc_id", "text")
    val dense = TextOps.hashEmbed(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(dense(0L) == dense(1L), "case folding must erase the difference")
    assert(dense(0L) != dense(2L))
    val unit = TextOps.hashEmbedUnit(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // the zero-vector doc is dropped, the rest are unit-norm
    assert(!unit.contains(3L))
    for ((_, v) <- unit) {
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-5)
    }
  }

  test("semanticDecontaminate flags gram-profile leakage, not unrelated docs") {
    val bench = Seq((1000L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"), // verbatim leak
      (1L, "The quick brown fox jumps over the lazy dog!"), // near-verbatim
      (2L, "completely unrelated payload about query engines"),
      (3L, "七言绝句平仄格律对仗工整")).toDF("doc_id", "text")
    val flagged = TextOps.semanticDecontaminate(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.contains(0L) && flagged(0L) == 1L)
    assert(flagged.contains(1L), "near-verbatim leak must be flagged")
    assert(!flagged.contains(2L) && !flagged.contains(3L))
    // the integer threshold is exact: a corpus doc equal to the
    // benchmark doc ITSELF (cos = 1) is excluded only by id, so the
    // same text under a different id flags with dot² · q² == p² · n²
    // comfortably satisfied — and an empty benchmark flags nothing
    assert(TextOps.semanticDecontaminate(corpus,
      bench.filter($"doc_id" < 0)).count() == 0)
  }

  test("threshold arithmetic survives int64 overflow on repetitive docs") {
    // a run of one char puts its whole gram mass in ONE slot: G grams →
    // wt = ±G, norm = G², dot(c,e) = G·G' — so dot²·q² reaches G⁴·q²,
    // which WRAPS int64 past ~25k grams. 26k-char runs: dot ≈ 6.8e8,
    // dot²·25 ≈ 1.1e19 > Long.MaxValue. cos = 1, so the pair MUST flag;
    // the pre-fix long arithmetic wrapped negative and silently missed
    // it (round-16 ADVICE, medium). Decimal(38,0) keeps it exact.
    val big = "a" * 26000
    val bench = Seq((1000L, big)).toDF("doc_id", "text")
    val corpus = Seq((0L, big), (1L, "totally unrelated payload"))
      .toDF("doc_id", "text")
    for (tier <- Seq(
        TextOps.semanticDecontaminate(corpus, bench),
        TextOps.semanticDecontaminateIvf(corpus, bench))) {
      val flagged = tier.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(flagged == Map(0L -> 1L),
        s"overflow-range identical pair must flag exactly: $flagged")
    }
    val flagSet = TextOps.semanticDecontaminateFlag(corpus, bench)
      .as[Long].collect().toSet
    assert(flagSet == Set(0L),
      s"flag tier must survive the overflow range too: $flagSet")
  }

  test("cosGe kernel: exact at the threshold boundary, BigInteger band") {
    def geRaw(a: Seq[Double], b: Seq[Double], p2: Long, q2: Long): Boolean =
      Seq((a, b)).toDF("a", "b")
        .select(graft.functions.vec.cosGe($"a", $"b", p2, q2).as("g"))
        .head.getBoolean(0)
    // exact equality AT the threshold: a=(1,2), b=(2,1) → dot=4,
    // norms 5·5 → dot²·q2 = 16·25 = p2·n1·n2 with p/q = 4/5 → ≥ holds
    assert(geRaw(Seq(1, 2), Seq(2, 1), 16, 25))
    // just past it: tightening the threshold to p2 = 17 flips the
    // verdict (16·25 < 17·25)
    assert(!geRaw(Seq(1, 2), Seq(2, 1), 17, 25))
    // the BigInteger border: scale the equality case until dot²
    // overflows the double fast path's exactness (k = 2^20 → dot² ≈
    // 1.9e25); the verdict must stay the exact ≥ (true), not a float
    // coin flip
    val k = (1L << 20).toDouble
    assert(geRaw(Seq(k, 2 * k), Seq(2 * k, k), 16, 25))
    assert(!geRaw(Seq(k, 2 * k), Seq(2 * k, k), 17, 25))
    // zero vectors and non-positive dots never match
    assert(!geRaw(Seq(0, 0), Seq(1, 1), 16, 25))
    assert(!geRaw(Seq(1, -1), Seq(-1, 1), 16, 25))
  }

  test("IVF-prescreened decon tier flags exactly the exact tier's set " +
    "at ANY quantizer sizing") {
    // mixed fixture: verbatim + near-verbatim leaks of several benchmark
    // docs, plus unrelated and short docs — the prescreened tier's
    // contract is flagged-set EQUALITY, and it is a THEOREM (triangle-
    // inequality ball cover ⇒ recall 1; shared integer predicate ⇒
    // precision 1), so it must hold under ANY nlist, including a
    // deliberately terrible one — a probabilistic prescreen could not
    // pass this test
    val benchDocs = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog"),
      (1001L, "distributed query engines shuffle hash partitions across executors"),
      (1002L, "七言绝句平仄格律对仗工整韵脚分明"))
    val bench = benchDocs.toDF("doc_id", "text")
    val corpus = (benchDocs.map { case (id, t) => (id - 1000L, t) } ++ Seq(
      (10L, "The quick brown fox jumps over the lazy dog!"),
      (11L, "distributed query engines shuffle hash partitions across workers"),
      (12L, "completely unrelated payload about sorting networks"),
      (13L, "ab"),
      (14L, "another unrelated doc discussing b-tree page splits"),
      (15L, "七言绝句平仄格律对仗工整"))).toDF("doc_id", "text")
    val exact = TextOps.semanticDecontaminate(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(exact.nonEmpty, "fixture must exercise the flagged branch")
    for (nl <- Seq(0, 2, 16)) {
      val ivf = TextOps.semanticDecontaminateIvf(corpus, bench, nlist = nl)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(ivf == exact, s"nlist=$nl: ivf=$ivf exact=$exact")
    }
    // and the early-exit FLAG tier returns exactly the exact tier's
    // doc-id set (existence semantics — counts drop, membership doesn't)
    val flag = TextOps.semanticDecontaminateFlag(corpus, bench)
      .as[Long].collect().toSet
    assert(flag == exact.map(_._1), s"flag=$flag exact=$exact")
  }

  test("gram-similar docs rank closer than unrelated ones (retrieval sanity)") {
    val base = "distributed query engines shuffle hash partitions across executors"
    val near = "distributed query engines shuffle hash partitions across workers"
    val far = "七言绝句平仄格律对仗工整韵脚分明"
    val docs = Seq((0L, base), (1L, near), (2L, far)).toDF("doc_id", "text")
    val emb = TextOps.hashEmbedUnit(docs).withColumnRenamed("doc_id", "vec_id")
    val q = emb.filter($"vec_id" === 0L)
    val ranked = Similarity.bruteForceTopK(emb, q, k = 2)
      .orderBy($"rank").select($"vec_id").as[Long].collect()
    assert(ranked.head == 1L, s"near-dup must outrank the unrelated doc: $ranked")
  }
}
