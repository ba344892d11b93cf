package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, TextOps}

/** Tests for the LLM-pipeline extensions: dedup, text analysis, similarity
  * search. The LSH paths (engine-internal hashes, no SQL oracle) are
  * checked for recall against their exact counterparts on the sf0.001
  * fixtures.
  */
class ExtendedOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("exact dedup keeps one row per distinct text, min id wins") {
    val d = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(d).as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 3L), (2L, 1L)))
  }

  test("shingles: distinct word 3-grams, short docs yield nulls filtered") {
    val d = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val g = d.select($"doc_id",
        filter(Dedup.shingles($"text", 3), x => x.isNotNull).as("grams"))
      .as[(Long, Seq[String])].collect().toMap
    assert(g(1L).toSet == Set("a b c", "b c d"))
    assert(g(2L).isEmpty)
  }

  test("minhash LSH recall: finds the exact-Jaccard near-dup pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.8)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    val lsh = Dedup.minHashLshPairs(docs, n = 3, numHashes = 64,
        bands = 16, minJaccard = 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall too low (found ${lsh.size} pairs)")
  }

  test("simhash: duplicate texts collide at distance 0; banding finds them") {
    val d = Seq(
      (1L, "spark window join batch agg filter"),
      (2L, "spark window join batch agg filter"),
      (3L, "completely different words entirely here now")).toDF("doc_id", "text")
    val hashes = Dedup.simHash64(d).as[(Long, Long)].collect().toMap
    assert(hashes(1L) == hashes(2L))
    assert(hashes(1L) != hashes(3L))
    val pairs = Dedup.simHashPairs(d, maxDist = 3)
      .select("d1", "d2", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("simhash on real near-dups: ≥98% Jaccard pairs land within distance 3") {
    val exact = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.95)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val sim = Dedup.simHashPairs(docs, maxDist = 3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val recall = exact.count(sim.contains).toDouble / math.max(exact.size, 1)
    assert(recall >= 0.8, s"simhash recall $recall on ${exact.size} pairs")
  }

  test("simhash layout independence: the scaled 2x32+probe layout returns " +
    "the identical maxDist<=3 pair set as the 4x16 exact-chunk layout") {
    // both layouts are COMPLETE for distance <= 3 (pigeonhole vs the
    // radius-1 multi-index probe) and the verify is exact, so the
    // result sets must be equal on any corpus — layout is pure cost
    def pairs(bands: Int, bits: Int, probe: Int) =
      Dedup.simHashPairs(docs, maxDist = 3, bands = bands,
        bandBits = bits, probeRadius = probe)
        .select("d1", "d2", "hamming")
        .as[(Long, Long, Int)].collect().toSet
    val exactChunks = pairs(4, 16, 0)
    val scaled = pairs(2, 32, 1)
    assert(exactChunks.nonEmpty, "fixture should contain near-dup pairs")
    assert(scaled == exactChunks,
      s"layouts disagree: ${scaled.diff(exactChunks)} / " +
        s"${exactChunks.diff(scaled)}")
    // an incomplete configuration must refuse loudly, not under-return
    val err = intercept[IllegalArgumentException] {
      Dedup.simHashPairs(docs, maxDist = 3, bands = 2, bandBits = 32,
        probeRadius = 0)
    }
    assert(err.getMessage.contains("complete"))
  }

  test("simhash hash-once re-banding: BandedHamming.bandRows over a " +
    "precomputed simHash64 frame replays simHashPairs for both layouts") {
    // the multi-layout probe gate computes the simhash kernel ONCE and
    // re-bands the cached fingerprint per layout — valid only if the
    // generic bandRows slicing + pairJoin reproduce simHashPairs exactly
    val hashed = Dedup.simHash64(docs)
    for ((b, bb, pr) <- Seq((4, 16, 0), (2, 32, 1))) {
      val direct = Dedup.simHashPairs(docs, maxDist = 3, bands = b,
        bandBits = bb, probeRadius = pr, storage = None)
        .select("d1", "d2", "hamming")
      val rebanded = graft.operators.BandedHamming.pairJoin(
        graft.operators.BandedHamming.bandRows(hashed, "simhash", b, bb),
        maxHamming = 3, bands = b, bandBits = bb, probeRadius = pr,
        maxBucketSize = None, storage = None)
        .withColumn("hamming", col("hamming").cast("int"))
        .select("d1", "d2", "hamming")
      assert(direct.exceptAll(rebanded).isEmpty &&
        rebanded.exceptAll(direct).isEmpty,
        s"layout ${b}x$bb probe $pr: re-banded pairs differ")
    }
  }

  test("maxGramDf caps hot-shingle fanout; denominator stays the full gram set") {
    // docs 1..30 share exactly ONE hot trigram ("the of and") and nothing
    // else; docs 31/32 are true duplicates that also contain it
    val hot = (1L to 30L).map(i => (i, s"the of and w${i}a w${i}b w${i}c"))
    val dups = Seq((31L, "the of and x y z"), (32L, "the of and x y z"))
    val d = (hot ++ dups).toDF("doc_id", "text")
    // uncapped: the hot gram alone links every doc pair — quadratic fanout
    val uncapped = Dedup.ngramJaccardPairs(d, n = 3, minJaccard = 0.01)
    assert(uncapped.count() == 32L * 31L / 2)
    // capped: the hot gram (df=32 > 10) is excluded from candidates — only
    // the real duplicate pair survives, scored against FULL gram counts
    // (4 grams each, 3 shared after the cap → 3/5, a lower bound of 1.0)
    val capped = Dedup.ngramJaccardPairs(d, n = 3, minJaccard = 0.5,
        maxGramDf = Some(10))
      .as[(Long, Long, Double)].collect()
    assert(capped.toSeq == Seq((31L, 32L, 0.6)))
  }

  test("clusterLabels releases its superseded checkpoints") {
    val sc = spark.sparkContext
    val docs = (1L to 7L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("d1", "d2")
    val before = sc.getPersistentRDDs.keySet
    Dedup.clusterLabels(docs, pairs, maxIter = 5).count()
    val leaked = sc.getPersistentRDDs.keySet -- before
    // edges + per-round checkpoints are released in-loop; only the final
    // labels checkpoint (read lazily by the result) may remain
    assert(leaked.size <= 1, s"leaked ${leaked.size} checkpoint RDDs")
    sc.getPersistentRDDs.filter(kv => leaked(kv._1))
      .values.foreach(_.unpersist(false))
  }

  test("cluster resolution: chains collapse to the min-id representative") {
    val docs = (1L to 7L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // clusters: {1,2,3} via chain 1-2, 2-3; {5,6}; singletons 4, 7
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("d1", "d2")
    val labels = Dedup.clusterLabels(docs, pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
    val kept = Dedup.keepRepresentatives(docs, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L, 7L))
  }

  test("end-to-end near-dedup: LSH pairs -> representatives on the fixture") {
    val pairs = Dedup.minHashLshPairs(docs, minJaccard = 0.8, storage = None)
    val kept = Dedup.keepRepresentatives(docs, pairs)
    val exactPairs = Dedup.ngramJaccardPairs(docs, minJaccard = 0.8)
      .as[(Long, Long, Double)].collect()
    // every surviving near-dup pair has at most one member kept
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    val bothKept = exactPairs.count(p => keptIds(p._1) && keptIds(p._2))
    assert(bothKept == 0, s"$bothKept near-dup pairs fully retained")
    assert(kept.count() < docs.count())
  }

  test("decontaminate drops exactly the docs sharing an n-gram with the benchmark") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),     // shares "alpha beta gamma"
      (2L, "epsilon zeta eta theta"),     // clean
      (3L, "iota kappa lambda mu"),       // shares "kappa lambda mu"
      (4L, "nu xi"),                      // too short for a 3-gram: clean
      (5L, "beta gamma delta epsilon")    // overlaps words but NO shared 3-gram
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "zz alpha beta gamma yy"),
      (101L, "qq kappa lambda mu")).toDF("doc_id", "text")
    val kept = Dedup.decontaminate(corpus, bench, n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 5L))
    val dropped = Dedup.contaminatedIds(corpus, bench, n = 3)
      .as[Long].collect().toSet
    assert(dropped == Set(1L, 3L))
  }

  test("minHash banding excludes gramless docs (regression: constant-signature aliasing)") {
    // two UNRELATED sub-n-token docs: without the gram guard both got
    // the constant empty-min signature => est_jaccard 1.0 false pair
    val docs = Seq(
      (1L, "hello world"), (2L, "foo bar"),
      (3L, "alpha beta gamma delta"), (4L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashLshPairs(docs, n = 3, numHashes = 16, bands = 8,
        minJaccard = 0.3, storage = None)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(!pairs.contains((1L, 2L)), "gramless docs must never pair")
    assert(pairs.contains((3L, 4L)), "real near-dups still found")
    // and a short benchmark doc must not poison fuzzy decontamination
    val bench = Seq((9L, "tiny doc")).toDF("doc_id", "text")
    assert(Dedup.contaminatedIdsFuzzy(docs, bench, n = 3,
      numHashes = 16, bands = 8, minJaccard = 0.3).count() == 0)
  }

  test("contaminationReport: one pass, per-bench counts, zero-hit bench still reports") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu")).toDF("doc_id", "text")
    val benchA = Seq((100L, "xx alpha beta gamma yy")).toDF("doc_id", "text")
    val benchB = Seq((200L, "nothing shared here at all")).toDF("doc_id", "text")
    val got = Dedup.contaminationReport(corpus,
        Seq("a" -> benchA, "b" -> benchB), n = 3)
      .select("bench", "n_contaminated", "n_corpus", "frac")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got("a") == ((1L, 3L, 1.0 / 3)))
    assert(got("b") == ((0L, 3L, 0.0)))
  }

  test("decontaminateFuzzy honors a non-default idCol (regression: ids column was hard-coded)") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated text about spark physical planning"))
      .toDF("id", "text")
    val bench = Seq(
      (9L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("id", "text")
    val kept = Dedup.decontaminateFuzzy(corpus, bench,
        n = 3, numHashes = 16, bands = 8, minJaccard = 0.5, idCol = "id")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L))
    assert(Dedup.contaminatedIdsFuzzy(corpus, bench, n = 3, numHashes = 16,
      bands = 8, minJaccard = 0.5, idCol = "id").columns.toSeq == Seq("id"))
  }

  test("repetition scores: dup-word and top-bigram fractions on crafted docs") {
    val d = Seq(
      (1L, "spam spam spam spam"),      // 4 words, 1 distinct; "spam spam" ×3
      (2L, "all words here differ"),    // no repetition
      (3L, "one"),                      // single word: no bigrams
      (4L, "Go go GO stop")             // case-folded dups
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionScores(d)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((4L, 3.0 / 4.0, 1.0)))
    assert(out(2L) == ((4L, 0.0, 1.0 / 3.0)))
    assert(out(3L) == ((1L, 0.0, 0.0)))
    assert(out(4L) == ((4L, 2.0 / 4.0, 2.0 / 3.0))) // "go go" twice of 3 bigrams
  }

  test("sequence packing: per-shard prefix offsets and pack assignment") {
    // shardSize=2 ⇒ shards {0,1},{2,3}; budget=5 tokens
    val d = Seq(
      (0L, "a b c"),          // shard 0, offset 0, pack 0
      (1L, "d e f g"),        // shard 0, offset 3, pack 0 (spans into 1)
      (2L, "h i j k l m n"),  // shard 1, offset 0, pack 0
      (3L, "o p")             // shard 1, offset 7, pack 1
    ).toDF("doc_id", "text")
    val out = TextOps.packSequences(d, budget = 5L, shardSize = 2L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(0L) == ((0L, 0L, 0L, 3L)))
    assert(out(1L) == ((0L, 0L, 3L, 4L)))
    assert(out(2L) == ((1L, 0L, 0L, 7L)))
    assert(out(3L) == ((1L, 1L, 7L, 2L)))
  }

  test("salted top-k per group equals the window ranking") {
    val rng = new scala.util.Random(7)
    val d = (1L to 300L).map(i =>
      (i, Seq("en", "de", "fr")(rng.nextInt(3)), rng.nextInt(50) / 10.0))
      .toDF("doc_id", "lang", "score")
    val got = graft.operators.TopK
      .topKPerGroup(d, "lang", "score", "doc_id", k = 7, saltBuckets = 4)
      .as[(Long, String, Long)].collect().toSet
    val expected = d
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"lang")
          .orderBy($"score".desc, $"doc_id")))
      .filter($"rank" <= 7)
      .select($"doc_id", $"lang", $"rank".cast("long"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == expected)
  }

  test("fingerprint matches the rolling-hash definition") {
    def roll(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 131 + c.toInt) % TextOps.FpMod)
    val d = Seq((1L, "ab"), (2L, "key agg row"), (3L, "héllo wörld 的是"))
      .toDF("doc_id", "text")
    val fp = TextOps.fingerprint(d).as[(Long, Long)].collect().toMap
    assert(fp(1L) == 12805L) // (0*131+97)*131+98 — probed golden
    assert(fp(1L) == roll("ab"))
    assert(fp(2L) == roll("key agg row"))
    assert(fp(3L) == roll("héllo wörld 的是")) // BMP codepoints == chars
  }

  test("token stats & quality: counts on a crafted doc") {
    val d = Seq((1L, "The quick, brown fox!")).toDF("doc_id", "text")
    val ts = TextOps.tokenStats(d).as[(Long, Long, Long, Long)].collect().head
    // ws: [The, quick,, brown, fox!]; bpe: [the, quick, ',', brown, fox, '!']
    assert(ts == ((1L, 4L, 6L, 21L)))
    val q = TextOps.qualityScore(d)
      .select("punct_ratio", "stop_ratio").as[(Double, Double)].collect().head
    assert(q._1 == 2.0 / 6.0)
    assert(q._2 == 1.0 / 4.0) // "the" after lowercasing

    // token-less docs: defined 0.0 everywhere, never NaN (regression:
    // 0/0 NaN sorted empty docs into the TOP curriculum-quality bin)
    val empty = Seq((1L, ""), (2L, "   \t "), (3L, "real text here"))
      .toDF("doc_id", "text")
    val eq = TextOps.qualityScore(empty)
      .select("doc_id", "punct_ratio", "stop_ratio", "mean_token_len", "quality")
      .collect().map(r => r.getLong(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(eq(1L).forall(v => !v.isNaN) && eq(1L).forall(_ == 0.0))
    assert(eq(2L).forall(v => !v.isNaN) && eq(2L).forall(_ == 0.0))
    assert(eq(3L).last > 0.0)
    val lq = TextOps.langQuality(empty).filter($"doc_id" === 1L)
      .select("quality").as[Double].collect().head
    assert(lq == 0.0)
  }

  test("langid votes for the list with most stopword hits") {
    val d = Seq(
      (1L, "the cat and the dog is a pet"),
      (2L, "der hund und die katze ist ein tier")).toDF("doc_id", "text")
    val out = TextOps.langId(d).select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "en", 2L -> "de"))
  }

  test("cosine: golden values on unit vectors") {
    val d = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val sims = d.as("a").crossJoin(d.as("b"))
      .select($"a.vec_id".as("v1"), $"b.vec_id".as("v2"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("sim"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(sims((1L, 2L))) < 1e-12)
    assert(math.abs(sims((1L, 3L)) - 1.0) < 1e-12)
  }

  test("LSH top-k recall against brute force") {
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // weakly-clustered fixture vectors (top-10 neighbors at cosine ≈ 0.4):
    // wide buckets + many tables is the right operating point
    val ann = Similarity.lshTopK(emb, queries, 10, planes = 4, tables = 12)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ann.contains).toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall@10 = $recall")
    info(s"ANN recall@10 = $recall")
  }

  test("IVF top-k recall against brute force") {
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, 10, nlist = 8, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall@10 = $recall")
    info(s"IVF recall@10 = $recall (nlist=8, nprobe=3 ⇒ ~3/8 corpus scanned)")
  }

  test("IVF-PQ top-k: recall holds and reported sims are EXACT cosines") {
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.ivfPQTopK(emb, queries, 10, nlist = 8, nprobe = 3,
      rerank = 4)
    val pqPairs = pq.select("query_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val recall = exact.count(pqPairs.contains).toDouble / exact.size
    assert(recall >= 0.3, s"IVF-PQ recall@10 = $recall")
    info(s"IVF-PQ recall@10 = $recall (nlist=8, nprobe=3, rerank=4)")
    // stage-2 contract: every reported similarity is the exact cosine,
    // untouched by the PQ approximation (only candidate SELECTION is
    // approximate)
    val pqSims = pq.select($"query_id", $"vec_id", $"sim")
      .as[(Long, Long, Double)].collect()
    val exactSims = queries.select($"vec_id".as("query_id"), $"embedding".as("q"))
      .crossJoin(emb.select($"vec_id", $"embedding"))
      .select($"query_id", $"vec_id",
        (Similarity.dot($"q", $"embedding") /
          (Similarity.norm($"q") * Similarity.norm($"embedding"))).as("sim"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    pqSims.foreach { case (qid, vid, sim) =>
      assert(math.abs(sim - exactSims((qid, vid))) < 1e-12,
        s"PQ-reported sim for ($qid,$vid) is not the exact cosine")
    }
  }

  test("IVF-PQ near-dup: pairs ⊆ brute-force pairs (exact verify), recall holds") {
    val exact = Similarity.bruteForceNearDupPairs(emb, 0.45)
      .as[(Long, Long)].collect().toSet
    val pq = Similarity.ivfPQNearDupPairs(emb, 0.45, nlist = 8, nprobe = 3,
        slack = 0.05)
      .as[(Long, Long)].collect().toSet
    // zero false positives: every emitted pair passed exact cosine
    assert(pq.subsetOf(exact), s"false positives: ${pq -- exact}")
    val recall = if (exact.isEmpty) 1.0
      else exact.count(pq.contains).toDouble / exact.size
    assert(recall >= 0.5, s"IVF-PQ near-dup recall = $recall")
    info(s"IVF-PQ near-dup recall = $recall (nlist=8, nprobe=3, slack=0.05)")
  }

  test("codes_dot kernel equals the integer dot of the byte vectors") {
    import graft.functions.vec
    val d = Seq((Array[Byte](1, -2, 3, 127), Array[Byte](-128, 5, 0, 2)))
      .toDF("a", "b")
    val got = d.select(vec.codesDot($"a", $"b")).as[Long].collect().head
    assert(got == (1 * -128 + -2 * 5 + 3 * 0 + 127 * 2).toLong)
  }

  test("quant_residual/dot_codes kernels: reconstruction and dot error bounds") {
    import graft.functions.vec
    val d = Seq(
      (Array(1.0f, -0.5f, 0.25f, 0.0f), Array(0.9, -0.4, 0.2, 0.1)),
      // binary-exact values: 0.3f widened to double is NOT 0.3, so the
      // zero-residual case needs representable constants
      (Array(0.25f, 0.5f, -0.75f, 1.0f), Array(0.25, 0.5, -0.75, 1.0))
    ).toDF("v", "c")
    val rows = d.select(
        vec.quantResidual($"v", $"c", 127).as("qr"), $"v", $"c")
      .select($"qr.codes", $"qr.scale", $"v", $"c")
      .as[(Array[Byte], Double, Array[Float], Array[Double])].collect()
    rows.foreach { case (codes, scale, v, c) =>
      assert(codes.length == v.length)
      // per-element reconstruction error ≤ scale/2 (the QuantStats bound
      // applied to the residual)
      v.indices.foreach { i =>
        val recon = c(i) + scale * codes(i)
        assert(math.abs(v(i) - recon) <= scale / 2 + 1e-12,
          s"elem $i: |${v(i)} - $recon| > $scale/2")
      }
    }
    // vector == centroid: zero residual, all-zero codes, exact
    val (z, _, _, _) = rows(1)
    assert(z.forall(_ == 0))
    // dot_codes equals the plain integer dot of query × codes
    val q = Array(0.5, -1.0, 2.0, 0.25)
    val got = d.limit(1).select(
        vec.dotCodes(typedLit(q), vec.quantResidual($"v", $"c", 127)
          .getField("codes")))
      .as[Double].collect().head
    val codes0 = rows(0)._1
    val want = q.indices.map(i => q(i) * codes0(i)).sum
    assert(math.abs(got - want) < 1e-12)
  }

  test("brute-force baselines refuse corpus-scale input (loud O(n²) guard)") {
    // the guard must trip BEFORE any n² job is planned — a tiny maxRows
    // against the fixture exercises the exact production failure shape
    val e1 = intercept[IllegalArgumentException] {
      Similarity.bruteForceNearDupPairs(emb, 0.45, maxRows = 10L)
    }
    assert(e1.getMessage.contains("cosineNearDupPairs"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(emb, emb, 10, maxRows = 10L)
    }
    assert(e2.getMessage.contains("lshTopK"))
    // bounded inputs still pass (the registered gates rely on this)
    assert(Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 2), 3)
      .count() > 0)
  }

  test("decontaminateBloom matches exact decontamination (FPs verified away)") {
    val corpus = docs.filter($"doc_id" % 13 =!= 0)
    val bench = docs.filter($"doc_id" % 13 === 0)
    val exact = Dedup.decontaminate(corpus, bench, n = 3)
      .select($"doc_id").as[Long].collect().toSet
    // a deliberately high fpp maximizes bloom false positives — the
    // verify join must still erase every one of them
    val bloom = Dedup.decontaminateBloom(corpus, bench, n = 3, fpp = 0.2)
      .select($"doc_id").as[Long].collect().toSet
    assert(bloom == exact)
  }

  test("semanticDedup: zero false drops, drop-recall vs exact dominated set") {
    val all = emb.select($"vec_id").as[Long].collect().toSet
    val kept = Similarity.semanticDedup(emb, 0.45, nlist = 8, nprobe = 3)
      .select($"vec_id").as[Long].collect().toSet
    val dropped = all -- kept
    val exactDropped = Similarity.bruteForceNearDupPairs(emb, 0.45)
      .select($"v2").as[Long].collect().toSet
    // every drop is exact-cosine verified → no false drops, ever
    assert(dropped.subsetOf(exactDropped))
    val recall = if (exactDropped.isEmpty) 1.0
      else exactDropped.count(dropped).toDouble / exactDropped.size
    assert(recall >= 0.8, s"drop recall = $recall")
    info(s"semantic dedup drop recall = $recall " +
      s"(${dropped.size}/${exactDropped.size} dominated docs caught)")
  }

  test("stratifiedHashSample: deterministic, growth-stable, rate-adherent") {
    val rates = Map("en" -> 0.5, "de" -> 0.0)
    val kept = TextOps.stratifiedHashSample(docs, rates)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    // dropped stratum and unknown strata yield nothing
    assert(kept.forall(_._2 == "en"))
    // deterministic across invocations
    val again = TextOps.stratifiedHashSample(docs, rates)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    assert(kept == again)
    // growth-stable: sampling a SUBSET never flips existing decisions
    val subset = TextOps.stratifiedHashSample(
        docs.filter($"doc_id" % 2 === 0), rates)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    assert(subset == kept.filter(_._1 % 2 == 0))
  }

  test("bpePairCounts: occurrence-weighted adjacent char pairs") {
    val d = Seq((1L, "aaa ab"), (2L, "aaa")).toDF("doc_id", "text")
    // "aaa"×2 → pairs aa,aa ×2 = 4; "ab"×1 → ab ×1; single chars excluded
    val out = TextOps.bpePairCounts(d, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("aa", 4L), ("ab", 1L)))
  }

  test("importanceWeights: hand-computed count-ratio goldens") {
    val d = Seq(
      (1L, "a b c", "en"), (2L, "a b d", "en"), (3L, "a b c", "de"))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.importanceWeights(d, isTarget = $"lang" === "en")
      .select($"doc_id", $"n_grams", $"sum_target", $"sum_all", $"weight")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // df: "a b" → (all 3, en 2); "b c" → (2, 1); "b d" → (1, 1)
    assert(out(1L) == ((2L, 3L, 5L, 4.0 / 6.0)))
    assert(out(2L) == ((2L, 3L, 4L, 4.0 / 5.0)))
    assert(out(3L) == ((2L, 3L, 5L, 4.0 / 6.0)))
    // the target-heavy doc outscores the mixed ones
    assert(out(2L)._4 > out(1L)._4)
  }

  test("LSH near-dup pairs ⊆ brute-force pairs (no false positives)") {
    val brute = Similarity.bruteForceNearDupPairs(emb, 0.45)
      .as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineNearDupPairs(emb, 0.45, planes = 6, tables = 8)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
    info(s"LSH near-dup recall = ${
      if (brute.isEmpty) 1.0 else brute.count(lsh.contains).toDouble / brute.size}")
  }

  test("IVF near-dup pairs ⊆ brute-force pairs, recall on the fixture") {
    val brute = Similarity.bruteForceNearDupPairs(emb, 0.45)
      .as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture should contain near-dup pairs")
    val ivf = Similarity.ivfNearDupPairs(emb, 0.45, nlist = 8, nprobe = 3,
        storage = None)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    // exact cosine verifies every candidate ⇒ zero false positives
    assert(ivf.subsetOf(brute))
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.5, s"IVF near-dup recall $recall on ${brute.size} pairs")
    info(s"IVF near-dup recall = $recall (nlist=8, nprobe=3)")
  }

  test("winnowHashes: sliding window-min, distinct, short-doc global min") {
    val d = Seq(
      (1L, Seq(5L, 3L, 8L, 1L, 9L, 2L)), // w=3 mins: 3,1,1,1 → {3,1}
      (2L, Seq(7L, 6L)),                 // shorter than window → global min
      (3L, Seq.empty[Long])
    ).toDF("id", "hashes")
    val out = d.select($"id",
        graft.functions.vec.winnowHashes($"hashes", 3).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) == Seq(3L, 1L))
    assert(out(2L) == Seq(6L))
    assert(out(3L).isEmpty)
  }

  test("winnowing guarantee: a shared run of ≥ window+n−1 tokens is detected") {
    // docs share a 6-token sentence (= window+n−1 with n=3, window=4)
    // embedded in otherwise fully distinct text
    val d = Seq(
      (1L, "alpha beta gamma the quick brown fox jumps over delta epsilon"),
      (2L, "one two three four the quick brown fox jumps over five six seven"),
      (3L, "nothing in common with anybody else at all")).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(d, n = 3, window = 4, minShared = 1)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("winnow candidates cover the exact Jaccard near-dup pairs on the fixture") {
    val exact = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.8)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val winnow = Dedup.winnowPairs(docs, n = 3, window = 4, minShared = 2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val recall = exact.count(winnow.contains).toDouble / exact.size
    assert(recall >= 0.95, s"winnow recall $recall on ${exact.size} pairs")
  }

  test("mixtureWeights: sqrt-temperature weights normalize; epochs hit the target") {
    val d = Seq.tabulate(100)(i =>
      (i.toLong, if (i < 90) "en" else "de")).toDF("doc_id", "pred_lang")
    val out = TextOps.mixtureWeights(d, "pred_lang", targetDocs = 1000L)
      .as[(String, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    val (wEn, wDe) = (math.sqrt(90.0), math.sqrt(10.0))
    assert(out("en")._2 == 90L && out("de")._2 == 10L)
    assert(math.abs(out("en")._3 - wEn / (wEn + wDe)) < 1e-12)
    assert(math.abs(out("en")._3 + out("de")._3 - 1.0) < 1e-12)
    // α=1/2 upsamples the low-resource group: more epochs per doc
    assert(out("de")._4 > out("en")._4)
    assert(out("de")._4 == math.ceil(1000.0 * out("de")._3 / 10.0).toLong)
  }

  test("hashSplit: deterministic, partition-invariant, growth-stable, near target") {
    val split1 = TextOps.hashSplit(docs, evalPerMille = 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val split2 = TextOps.hashSplit(docs.repartition(7), evalPerMille = 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(split1 == split2, "assignment must not depend on partitioning")
    // growth stability: splitting a subset assigns the same labels
    val sub = TextOps.hashSplit(docs.filter($"doc_id" < 20), evalPerMille = 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(sub.forall { case (id, s) => split1(id) == s })
    val frac = split1.values.count(_ == "eval").toDouble / split1.size
    assert(frac > 0.03 && frac < 0.2, s"eval fraction $frac far off 10%")
  }

  test("piiRedact counts and redacts emails, phones, IPv4s; clean text untouched") {
    val d = Seq(
      (1L, "reach me at a.b+c@mail-host.org or 555-0199 from 10.0.3.77 ok"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextOps.piiRedact(d)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1L, 1L, 1L,
      "reach me at <EMAIL> or <PHONE> from <IP> ok")))
    assert(out(2L) == ((2L, 0L, 0L, 0L, "no pii here at all")))
  }

  test("vocabTopK: exact counts, count-desc/token-asc tiebreak, limit honored") {
    val d = Seq((1L, "B a a"), (2L, "c b A")).toDF("doc_id", "text")
    // lowercased: a×3, b×2, c×1
    val out = TextOps.vocabTopK(d, 2).as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 3L), ("b", 2L)))
  }

  test("IVF auto-sizing: explicit nlist wins; default resolves to √n " +
      "clamped to [16, 4096]") {
    val small = spark.range(100).toDF("vec_id")
    val mid = spark.range(2500).toDF("vec_id")
    assert(Similarity.autoNlist(small, 8) == 8, "explicit passes through")
    assert(Similarity.autoNlist(small, 0) == 16, "√100 clamps up to 16")
    assert(Similarity.autoNlist(mid, 0) == 50, "√2500 = 50")
    // the tuned fixture queries keep explicit small-corpus sizing, so
    // an auto default must never change an oracled gate: pin that the
    // IVF top-k result under auto sizing still returns full rank sets
    val ivf = Similarity.ivfTopK(emb, emb.filter($"vec_id" < 2), 3)
    assert(ivf.groupBy($"query_id").count().as[(Long, Long)]
      .collect().toMap.values.forall(_ == 3L))
  }

  test("reciprocalRankFusion: hand-computed fusion, overlap evidence, " +
      "tie-break, bit-exact scores") {
    // ranking A: d1,d2,d3 — ranking B: d3,d4
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val b = Seq((3L, 1L), (4L, 2L)).toDF("doc_id", "rank")
    val out = Similarity.reciprocalRankFusion(Seq(a, b), k = 4, rrfK = 60)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val s = Map( // exact IEEE expectations, same op order as the operator
      1L -> 1.0 / 61, 2L -> 1.0 / 62, 3L -> (1.0 / 63 + 1.0 / 61),
      4L -> 1.0 / 62)
    // d3 first (both rankings), then d1; d2 and d4 tie EXACTLY
    // (1/62 bit-equal) → doc_id breaks
    assert(out.map(r => (r._1, r._2, r._3)) == Seq(
      (1L, 3L, 2L), (2L, 1L, 1L), (3L, 2L, 1L), (4L, 4L, 1L)))
    out.foreach(r => assert(r._4 == s(r._2), s"bit-exact score for ${r._2}"))
  }

  test("chunkDocuments: overlap, short tails, gapped stride, empty docs, " +
      "deterministic identity, shuffle-free plan") {
    val d = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    // size 4, stride 3: doc 1 (len 10) starts 0,3,6,9 → last is 1 char
    val out = TextOps.chunkDocuments(d, size = 4, stride = 3)
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, 0L, "abcd", 4L), (1L, 1L, 3L, "defg", 4L),
      (1L, 2L, 6L, "ghij", 4L), (1L, 3L, 9L, "j", 1L),
      (2L, 0L, 0L, "xy", 2L)))
    // stride > size: gapped sampling, identity stays start/stride
    val gap = TextOps.chunkDocuments(d, size = 2, stride = 5)
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(gap == Set(
      (1L, 0L, 0L, "ab", 2L), (1L, 1L, 5L, "fg", 2L),
      (2L, 0L, 0L, "xy", 2L)))
    // row-local: no exchange anywhere in the plan
    val plan = TextOps.chunkDocuments(d, 4, 3).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("lineDedup: corpus-hot lines removed everywhere, blanks and order kept, all-boilerplate doc survives empty") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nunique alpha\n\nunique beta\nFOOTER"),
      (2L, "COOKIE BANNER\nunique gamma\nFOOTER"),
      (3L, "COOKIE BANNER\nFOOTER"), // nothing unique: must survive empty
      (4L, "solo document line")     // untouched
    ).toDF("doc_id", "text")
    val byId = TextOps.lineDedup(docs, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(byId(1L) == (("unique alpha\n\nunique beta", 2L))) // blank kept
    assert(byId(2L) == (("unique gamma", 2L)))
    assert(byId(3L) == (("", 2L)))
    assert(byId(4L) == (("solo document line", 0L)))
  }

  test("sourceCap: bottom-cap by md5 digest, growth evicts but never " +
      "reshuffles, map-side WindowGroupLimit in the plan") {
    def digest(src: String, id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$src:$id".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val base = (0L to 9L).map(i => (i, if (i < 6) "a" else "b", s"t$i"))
      .toDF("doc_id", "source", "text")
    val kept = TextOps.sourceCap(base, cap = 2)
      .select($"source", $"doc_id").as[(String, Long)].collect().toSet
    // reference: bottom-2 md5 per source, computed independently
    val expect = Seq("a" -> (0L to 5L), "b" -> (6L to 9L)).flatMap {
      case (s, ids) =>
        ids.sortBy(id => (digest(s, id), id)).take(2).map((s, _))
    }.toSet
    assert(kept == expect)

    // growth: add docs to source b only — a's kept set is untouched;
    // b's new kept set is the bottom-2 of the GROWN hash population
    // (supersets never reshuffle, they only evict)
    val grown = base.union(
      (10L to 14L).map(i => (i, "b", s"t$i")).toDF("doc_id", "source", "text"))
    val kept2 = TextOps.sourceCap(grown, cap = 2)
      .select($"source", $"doc_id").as[(String, Long)].collect().toSet
    assert(kept2.filter(_._1 == "a") == kept.filter(_._1 == "a"))
    val bAll = (6L to 14L).sortBy(id => (digest("b", id), id)).take(2)
      .map(("b", _)).toSet
    assert(kept2.filter(_._1 == "b") == bAll)

    // skew safety: the rank<=cap filter compiles to a map-side
    // WindowGroupLimit, so a mega-source never ships its full row set
    val plan = TextOps.sourceCap(base, cap = 2).queryExecution
      .executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("bm25TopK: hand-computed golden — ranking, evidence, scores") {
    // N=4, Σdl=10, avgdl=2.5; query {apple, cherry}, df(apple)=df(cherry)=2
    // → idf = ln((4−2+0.5)/2.5 + 1) = ln 2. Contributions (k1=1.2, b=.75):
    //   d1 apple tf2 dl3: ln2·4.4/(2+1.2·(0.25+0.9))   = 0.9023
    //   d2 cherry tf1 dl2: ln2·2.2/(1+1.2·(0.25+0.6))  = 0.7549
    //   d3 cherry tf3 + apple tf1, dl4                 = 0.9651+0.5566
    //   d4: no match — absent from the result entirely
    val d = Seq(
      (1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "cherry cherry cherry apple"), (4L, "dog"))
      .toDF("doc_id", "text")
    val out = TextOps.bm25TopK(d, Seq("apple", "cherry"), k = 3,
        storage = None)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3, r._4, r._5)) == Seq(
      (1L, 3L, 2L, 4L, 4L), // rank 1: d3, both terms, tf_sum 4, dl 4
      (2L, 1L, 1L, 2L, 3L),
      (3L, 2L, 1L, 1L, 2L)))
    val ln2 = math.log(2.0)
    val expected = Map(
      3L -> (ln2 * 6.6 / 4.74 + ln2 * 2.2 / 2.74),
      1L -> ln2 * 4.4 / 3.38,
      2L -> ln2 * 2.2 / 2.02)
    out.foreach(r => assert(math.abs(r._6 - expected(r._2)) < 1e-9,
      s"score for doc ${r._2}"))
    // k larger than the match set: only matching docs return
    assert(TextOps.bm25TopK(d, Seq("apple", "cherry"), k = 10,
      storage = None).count() == 3)

    // all-empty/whitespace corpus: sumDl = 0 → empty result with the
    // normal schema, not NaN scores from a 0-denominator avgdl
    val empty = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val guarded = TextOps.bm25TopK(empty, Seq("apple"), k = 3, storage = None)
    assert(guarded.columns.toSeq ==
      Seq("rank", "doc_id", "matched_terms", "tf_sum", "dl", "score"))
    assert(guarded.count() == 0)
  }

  test("int8 round-trip: error ≤ scale/2, zero vector exact, scale = max|x|/127") {
    val d = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.int8RoundTrip(d)
      .as[(Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.values.forall(_._4), "quant_ok must hold by construction")
    assert(out(1L)._3 === 1.0 / 127)
    assert(out(1L)._2 <= out(1L)._3 / 2 + 1e-12)
    assert(out(2L)._2 == 0.0)
    // the gate also holds corpus-wide on the fixture embeddings
    val all = Similarity.int8RoundTrip(emb).agg(min($"quant_ok"))
      .as[Boolean].collect().head
    assert(all)
  }

  test("char n-gram hashes: per-position, codepoint-walked, aligned across n") {
    import graft.functions.vec
    val d = Seq(("abcab", 1)).toDF("text", "id")
    val (tri, bi) = d.select(
        vec.charNgramHashes($"text", 3), vec.charNgramHashes($"text", 2))
      .as[(Seq[Long], Seq[Long])].collect().head
    assert(tri.length == 3 && bi.length == 4)
    // repeated grams hash identically: "ab" at positions 0 and 3
    assert(bi(0) == bi(3) && bi(0) != bi(1))
    // surrogate pairs count as ONE character (like DuckDB substr)
    val emoji = "a😀b" // 3 codepoints, 4 UTF-16 units
    val t = Seq((emoji, 1)).toDF("text", "id")
      .select(vec.charNgramHashes($"text", 3)).as[Seq[Long]].collect().head
    assert(t.length == 1)
    // shorter than n → empty, never negative allocation
    val e = Seq(("ab", 1)).toDF("text", "id")
      .select(vec.charNgramHashes($"text", 3)).as[Seq[Long]].collect().head
    assert(e.isEmpty)
  }

  test("char LM score: natural text scores lower entropy than gibberish") {
    // 30 docs sharing a repetitive natural phrase + 2 gibberish docs:
    // the self-trained trigram model must rank gibberish higher-entropy
    val natural = (1 to 30).map(i =>
      (i.toLong, s"the cat sat on the mat number $i"))
    val junk = Seq(
      (101L, "qzxj vkwp brfg hmtd lsnc"),
      (102L, "zzqx jjwv ppkf ggth ddmr"))
    val df = (natural ++ junk).toDF("doc_id", "text")
    val out = TextOps.charLmScore(df, storage = None)
      .select($"doc_id", $"xent").as[(Long, Double)].collect().toMap
    val nat = natural.map(d => out(d._1)).sum / natural.size
    assert(out(101L) > nat && out(102L) > nat,
      s"gibberish must score above natural: ${out(101L)}, ${out(102L)} vs $nat")
    // exact count plumbing on a hand-checked fixture: "aaaa" has two
    // "aaa" positions (count 2 each); the context "aa" is counted over
    // TRIGRAM positions only (2), matching the oracle's tg-derived cc
    val tiny = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val row = TextOps.charLmScore(tiny, storage = None)
      .select($"n_grams", $"sum_tri", $"sum_ctx")
      .as[(Long, Long, Long)].collect().head
    assert(row == ((2L, 4L, 4L)))
  }

  test("BPE: trainer learns the classic merges; kernel encodes by rank; round trip holds") {
    val corpus = Seq((1L, "low low low lower lower newest")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrainMerges(corpus, numMerges = 3)
    // pair counts: (l,o)=5 ties (o,w)=5 -> lexicographic; then (lo,w)=5;
    // then (low,e)=2 ties (e,r)=2 -> (e,r) wins lexicographically
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("e", "r")))

    val enc = corpus.sparkSession.range(1)
      .select(graft.functions.vec.bpeEncode(lit("lower"), merges).as("t"))
      .selectExpr("t").as[Seq[String]].collect().head
    assert(enc == Seq("low", "er"))

    val docs = Seq((1L, "low lower lowest"), (2L, ""), (3L, "  "))
      .toDF("doc_id", "text")
    val stats = TextOps.bpeApplyStats(docs, merges)
      .select($"doc_id", $"n_words", $"n_tokens", $"roundtrip_ok", $"bounds_ok")
      .as[(Long, Long, Long, Boolean, Boolean)].collect().toSet
    // lowest -> low e s t (no (e,s)/(s,t) merges learned) = 4 tokens
    assert(stats == Set(
      (1L, 3L, 1L + 2L + 4L, true, true),
      (2L, 0L, 0L, true, true),
      (3L, 0L, 0L, true, true)))
  }

  test("incrementalExact drops cross-corpus and within-shard duplicates only") {
    val corpus = Seq((1L, "aaa"), (2L, "bbb")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "aaa"), // duplicates the corpus -> dropped
      (11L, "ccc"), (12L, "ccc"), // within-shard dup -> min id wins
      (13L, "ddd") // genuinely new
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalExact(fresh, corpus)
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(11L, 13L))
  }

  test("blocklistScreen + characteristicTerms: edge docs behave") {
    val d = Seq(
      (1L, "the quick fox and the dog"),
      (2L, "clean words only here"),
      (3L, "")).toDF("doc_id", "text")
    // doc 1 hits both words (distinct count 2); empty doc hits nothing
    assert(TextOps.blocklistScreen(d, Seq("the", "and"), 0)
      .as[(Long, Long, Boolean)].collect().toSet ==
      Set((1L, 2L, false), (2L, 0L, true), (3L, 0L, true)))
    // characteristic terms: corpus-wide word screened out at df ≤ N/2
    val corp = Seq((1L, "alpha alpha shared"), (2L, "beta shared"),
      (3L, "gamma shared")).toDF("doc_id", "text")
    val terms = TextOps.characteristicTerms(corp, k = 2)
      .select($"doc_id", $"rank", $"tok").as[(Long, Long, String)]
      .collect().toSet
    // "shared" (df 3 > 1.5) is screened; per-doc uniques survive
    assert(terms == Set((1L, 1L, "alpha"), (2L, 1L, "beta"),
      (3L, 1L, "gamma")))
  }

  test("decontaminateFraction: gentler than any-gram, full overlap drops") {
    val corpus = docs.filter($"doc_id" % 13 =!= 0)
    val bench = docs.filter($"doc_id" % 13 === 0)
    val anyGram = Dedup.decontaminate(corpus, bench, n = 3)
      .select($"doc_id").as[Long].collect().toSet
    val frac = Dedup.decontaminateFraction(corpus, bench, n = 3,
        maxOverlap = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    // the any-gram rule drops a superset: fraction keeps ⊇ any-gram keeps
    assert(anyGram.subsetOf(frac))
    // a full-overlap doc (exact dup of a bench doc) drops under BOTH
    val benchText = bench.select($"text").as[String].head()
    val poisoned = corpus.unionByName(
      Seq((999999L, benchText, "en", "x", benchText.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val keptP = Dedup.decontaminateFraction(poisoned, bench, n = 3,
        maxOverlap = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(!keptP.contains(999999L))
    // threshold 1.0 keeps everything except (vacuously) nothing
    val all = Dedup.decontaminateFraction(corpus, bench, n = 3,
        maxOverlap = 1.0).count()
    assert(all == corpus.count())
  }

  test("incrementalNearDupPairs equals the full recompute on the shard") {
    val half = docs.agg(max($"doc_id")).head.getLong(0) / 2
    // forward split: old = low ids, new = high ids
    val idx = Dedup.minHashBandIndex(docs.filter($"doc_id" <= half),
      n = 3, numHashes = 64, bands = 16)
    val inc = Dedup.incrementalNearDupPairs(docs.filter($"doc_id" > half),
        idx, n = 3, numHashes = 64, bands = 16, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val full = Dedup.minHashLshPairs(docs, n = 3, numHashes = 64,
        bands = 16, minJaccard = 0.5, storage = None)
      .as[(Long, Long, Double)].collect().toSet
    assert(inc == full.filter(_._2 > half), "forward split diverged")
    assert(inc.nonEmpty, "vacuous fixture: no near-dup pair touches the shard")
    // REVERSED split: the new shard's ids are SMALLER than the corpus's —
    // pairs must still normalize (least/greatest), touching = d1 <= half
    val idx2 = Dedup.minHashBandIndex(docs.filter($"doc_id" > half),
      n = 3, numHashes = 64, bands = 16)
    val inc2 = Dedup.incrementalNearDupPairs(docs.filter($"doc_id" <= half),
        idx2, n = 3, numHashes = 64, bands = 16, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(inc2 == full.filter(_._1 <= half), "reversed split diverged")
  }

  test("bandedNearDupPairs rejects an out-of-domain minJaccard loudly " +
    "(the retired positional-numHashes shape widens into it)") {
    val half = docs.agg(max($"doc_id")).head.getLong(0) / 2
    val idx = Dedup.minHashBandIndex(docs.filter($"doc_id" <= half),
      n = 3, numHashes = 64, bands = 16)
    val newBanded = Dedup.minHashBandIndex(docs.filter($"doc_id" > half),
      n = 3, numHashes = 64, bands = 16)
    // the pre-round-11 3-positional shape `(idx, banded, 64)` widens
    // 64 → minJaccard = 64.0; with the round-12 bridges retired, the
    // domain require must fail AT CALL TIME (not silently return zero
    // pairs, the original bug)
    val err = intercept[IllegalArgumentException] {
      Dedup.bandedNearDupPairs(idx, newBanded, 64)
    }
    assert(err.getMessage.contains("minJaccard"), err.getMessage)
    assert(err.getMessage.contains("numHashes"), err.getMessage)
    // in-domain calls are untouched
    assert(Dedup.bandedNearDupPairs(idx, newBanded, minJaccard = 0.5)
      .count() > 0)
  }

  test("cleanText: strips tags, folds combining accents, collapses whitespace") {
    val cleaned = Seq("<div>héllo   <b>world</b></div>\t mixed")
      .toDF("t")
      .select(TextOps.cleanText($"t").as("c")).as[String].collect().head
    assert(cleaned == "héllo world mixed") // é is the COMPOSED form
    // already-clean ASCII passes through untouched
    val id = Seq("plain text").toDF("t")
      .select(TextOps.cleanText($"t").as("c")).as[String].collect().head
    assert(id == "plain text")
  }

  test("containment finds subset inclusion that Jaccard misses") {
    val short = "alpha beta gamma delta epsilon"
    val long = short + " " + (0 until 40).map(i => s"f$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, n = 3, minContainment = 0.9)
      .select($"d1", $"d2", $"containment")
      .as[(Long, Long, Double)].collect()
    // all of doc 1's grams live in doc 2 -> containment 1.0 one way only
    assert(cont.toSeq == Seq((1L, 2L, 1.0)))
    val jac = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.8)
    assert(jac.isEmpty, "Jaccard should miss the subset pair")
  }

  test("applySubstringDedup cuts exactly the covered tokens, keeps empty docs") {
    val docs = Seq(
      (1L, "x1 x2 q w e r t y x3 x4"),
      (2L, "z1 q w e r t y z2 z3"),
      (3L, "p1 p2 p3 p4 p5 m p1 p2 p3 p4 p5"),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8"),
      (5L, "q w e r t y") // fully duplicated phrase -> empty rebuild
    ).toDF("doc_id", "text")
    val out = Dedup.applySubstringDedup(docs, k = 5, storage = None)
      .select($"doc_id", $"clean_text", $"n_kept", $"n_dropped")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, "x1 x2 x3 x4", 4L, 6L)))
    assert(out(2L) == ((2L, "z1 z2 z3", 3L, 6L)))
    assert(out(3L) == ((3L, "m", 1L, 10L)))
    assert(out(4L) == ((4L, "u1 u2 u3 u4 u5 u6 u7 u8", 8L, 0L)))
    assert(out(5L) == ((5L, "", 0L, 6L)))
  }

  test("substringSpans: cross-doc phrase merges overlaps; within-doc repeat splits on gap") {
    val docs = Seq(
      (1L, "x1 x2 q w e r t y x3 x4"), // shared phrase at tokens 3..8
      (2L, "z1 q w e r t y z2 z3"), // same phrase at tokens 2..7
      (3L, "p1 p2 p3 p4 p5 m p1 p2 p3 p4 p5"), // self-repeat, gap at 6
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8") // clean
    ).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, k = 5, storage = None)
      .select($"doc_id", $"span_start", $"span_end", $"span_tokens",
        $"n_dup_grams")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // "q w e r t" and "w e r t y" both occur twice -> overlapping grams
    // merge into one span per doc; doc 3's two occurrences of the same
    // 5-gram leave token 6 uncovered -> two spans; doc 4 emits nothing
    assert(spans == Set(
      (1L, 3L, 8L, 6L, 2L),
      (2L, 2L, 7L, 6L, 2L),
      (3L, 1L, 5L, 5L, 1L),
      (3L, 7L, 11L, 5L, 1L)))
  }

  test("maxBucketSize drops mega-bucket candidates, keeps the rest, and reports drops") {
    // 20 identical docs collapse every band into one 20-doc mega-bucket;
    // the p/q pair lives in its own 2-doc buckets and must survive the cap
    val d = ((1 to 20).map(i => (i.toLong, "a b c d e f g")) ++
      Seq((100L, "p q r s t u v"), (101L, "p q r s t u v"))).toDF("doc_id", "text")
    // observation metrics surface via the listener bus (async) — collect
    // them through a QueryExecutionListener and poll briefly
    val seen = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Row]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (n, r) =>
          if (n.startsWith("minhash_bucket_cap")) seen.put(n, r) }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val capped = Dedup.minHashLshPairs(d, n = 3, numHashes = 16, bands = 8,
          minJaccard = 0.5, storage = None, maxBucketSize = Some(5))
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(capped == Set((100L, 101L)),
        s"mega-bucket pairs must drop, small-bucket pair must survive: $capped")
      // incremental path: occupancy over (old ∪ new), same outcome
      val idx = Dedup.minHashBandIndex(d.filter($"doc_id" <= 20),
        n = 3, numHashes = 16, bands = 8)
      val inc = Dedup.incrementalNearDupPairs(
          d.filter($"doc_id" >= 100), idx, n = 3, numHashes = 16, bands = 8,
          minJaccard = 0.5, storage = None, maxBucketSize = Some(5))
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(inc == Set((100L, 101L)), s"incremental capped pairs: $inc")
      // the dropped volume is observable: 20 docs × 8 bands of mega-bucket
      // rows were excluded (8 full buckets of 20 on the identical docs)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var metric: Option[org.apache.spark.sql.Row] = None
      while (metric.isEmpty && System.nanoTime() < deadline) {
        metric = seen.values().stream().filter(r =>
          r.getAs[Long]("dropped_rows") > 0).findFirst()
          .map[Option[org.apache.spark.sql.Row]](Some(_)).orElse(None)
        if (metric.isEmpty) Thread.sleep(50)
      }
      assert(metric.nonEmpty, "a minhash_bucket_cap observation with drops must fire")
      assert(metric.get.getAs[Long]("dropped_rows") == 160L,
        s"expected 20 docs x 8 bands dropped, got ${metric.get}")
      assert(metric.get.getAs[Long]("max_bucket_n") == 20L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("from-index serving derives the estimate from the index's own sig length") {
    // a persisted index read back in a later session carries no memory
    // of its numHashes; the divisor must come from size(sig) — with a
    // parameter divisor, serving a 128-hash index at the old default 64
    // yielded est_jaccard up to 2.0 and every candidate passed any cut
    val d = Seq((1L, "a b c d e"), (2L, "a b c d e"),
      (3L, "x y z w v u")).toDF("doc_id", "text")
    val banded = Dedup.minHashBandIndex(d, n = 3, numHashes = 128, bands = 16)
    val pairs = Dedup.minHashLshPairsFromIndex(banded, minJaccard = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1.0)),
      s"identical docs must pair at est exactly 1.0 (divisor = sig length): $pairs")
  }

  test("minHash banding hashes each doc's grams exactly once (plan regression)") {
    // Catalyst pushes filters through projects by re-inlining aliases; the
    // old size(gramHashes)>0 guard therefore ran the tokenize+hash kernel
    // twice per row. The null-signature formulation keeps it at one.
    val plan = Dedup.minHashBandIndex(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .queryExecution.optimizedPlan.toString
    val hits = "ngram_hashes".r.findAllIn(plan).length
    assert(hits == 1, s"expected exactly one ngram_hashes in the plan, got $hits:\n$plan")
  }
}
