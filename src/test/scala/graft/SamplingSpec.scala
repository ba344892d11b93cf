package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** Distributed prefix sum + the order-dependent sampling/ranking ops
  * built on it (systematic PPS sampling, quantile binning).
  */
class SamplingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // ids with gaps + varying weights, deterministic
  private def fixture = (0 until 200)
    .map(i => (i * 3L + (i % 5), (i * 37 % 91 + 1).toLong))
    .toDF("doc_id", "w")

  test("shufflePositions: exact permutation, deterministic, seed-sensitive") {
    val docs = fixture.select("doc_id")
    val a = Sampling.shufflePositions(docs)
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    assert(a.values.toSet == (0L until 200L).toSet, "not a 0..n-1 permutation")
    // partition-invariant and deterministic: same seed replays the order
    val b = Sampling.shufflePositions(docs.repartition(13))
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    assert(a == b)
    // a different seed is a different permutation (overwhelmingly)
    val c = Sampling.shufflePositions(docs, seed = 7L)
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    assert(c != a)
    assert(c.values.toSet == (0L until 200L).toSet)
  }

  test("orderedCumsum equals the single-partition global window") {
    val got = Sampling.orderedCumsum(fixture, expr("doc_id div 64"),
      Seq(col("doc_id")), col("w"))
    val expect = fixture.withColumn("cum",
      sum(col("w")).over(Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.select("doc_id", "cum").except(
      expect.select("doc_id", "cum")).isEmpty)
    assert(expect.select("doc_id", "cum").except(
      got.select("doc_id", "cum")).isEmpty)
  }

  test("orderedCumsum is partitioning-invariant") {
    val scrambled = fixture.repartition(7, col("w"))
    val a = Sampling.orderedCumsum(fixture, expr("doc_id div 64"),
      Seq(col("doc_id")), col("w")).select("doc_id", "cum").collect().toSet
    val b = Sampling.orderedCumsum(scrambled, expr("doc_id div 64"),
      Seq(col("doc_id")), col("w")).select("doc_id", "cum").collect().toSet
    assert(a == b)
  }

  test("ppsSample selects exactly k rows and hits every k-th weight point") {
    val k = 10
    val picked = Sampling.ppsSample(fixture, col("w"), k)
      .select("doc_id", "w", "cum", "pick")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val total = fixture.agg(sum("w")).as[Long].head()
    // no weight exceeds total/k in this fixture → exactly k picks,
    // one per selection point
    assert(picked.length == k)
    assert(picked.map(_._4).toSeq == (1L to k.toLong))
    // each picked row's (cum-w, cum] interval contains its point i*total/k
    picked.foreach { case (id, w, cum, pick) =>
      val point = pick * total / k // floor; selection means point in interval
      assert(cum * k / total == pick && (cum - w) * k / total < pick,
        s"doc $id: interval (${cum - w}, $cum] misses point $point")
    }
  }

  test("ppsSample selection probability tracks weight (heavy rows always in)") {
    // one row carries half the total weight → certainty selection
    val df = (Seq((0L, 1000L)) ++ (1 to 100).map(i => (i.toLong, 10L)))
      .toDF("doc_id", "w")
    val picked = Sampling.ppsSample(df, col("w"), 5)
      .select("doc_id").as[Long].collect()
    assert(picked.contains(0L))
  }

  test("quantileBins: sizes differ by at most 1, bins follow score order") {
    val df = (0 until 137).map(i => (i.toLong, (i * 31 % 97) / 97.0))
      .toDF("doc_id", "score")
    val got = Sampling.quantileBins(df, col("score"), nbins = 7,
      idCol = "doc_id")
      .select(col("doc_id"), col("score"), col("rank"), col("bin"))
      .as[(Long, Double, Long, Long)].collect()
    val sizes = got.groupBy(_._4).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0L until 7L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    // bin is monotone in rank; rank is monotone in (score, doc_id)
    val byRank = got.sortBy(_._3)
    assert(byRank.map(_._4).sameElements(byRank.map(_._4).sorted))
    assert(byRank.map(r => (r._2, r._1)).sameElements(
      byRank.map(r => (r._2, r._1)).sorted))
    // exact formula parity with the oracle: bin = ((rank-1)*k) div n
    got.foreach { case (_, _, rank, bin) =>
      assert(bin == (rank - 1) * 7 / 137)
    }
  }

  test("grouped orderedCumsum ranks within each group like per-group windows") {
    val df = (0 until 120).map(i =>
      (i.toLong, s"g${i % 3}", (i * 17 % 41).toLong)).toDF("id", "g", "v")
    val got = Sampling.orderedCumsum(df, expr("v div 8"),
        Seq(col("v"), col("id")), lit(1L), "rank", totalName = Some("n"),
        partCols = Seq("g"))
      .select("id", "rank", "n")
    val expect = df
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v"), col("id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .select("id", "rank", "n")
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }

  test("negativePairs: k partners each, never self, all ids real, deterministic") {
    val docs = (0 until 20).map(i => (i.toLong, s"l${i % 4}"))
      .toDF("doc_id", "lang")
    val pairs = Sampling.negativePairs(docs, k = 3)
      .select($"doc_id", $"neg_rank", $"neg_id", $"neg_lang")
      .as[(Long, Long, Long, String)].collect()
    assert(pairs.length == 60)
    assert(pairs.forall { case (d, _, neg, _) => d != neg })
    assert(pairs.forall { case (_, _, neg, l) =>
      neg >= 0 && neg < 20 && l == s"l${neg % 4}" })
    val again = Sampling.negativePairs(docs, k = 3)
      .select($"doc_id", $"neg_rank", $"neg_id", $"neg_lang")
      .as[(Long, Long, Long, String)].collect()
    assert(pairs.toSet == again.toSet)
  }

  test("iqrOutliers: quartiles are exact order statistics, fences count correctly") {
    // group a: values 1..8 plus a wild 100 -> n=9, q1 = rank ceil(9/4)=3
    // -> value 3, q3 = rank ceil(27/4)=7 -> value 7, IQR=4,
    // fences [-3, 13] -> one outlier (100)
    val rows = (1 to 8).map(v => (v.toLong, "a", v.toDouble)) :+
      (9L, "a", 100.0)
    val out = Sampling.iqrOutliers(rows.toDF("event_id", "event_type", "value"),
        "value", "event_type", "event_id",
        expr("CAST(floor(value) AS BIGINT)"))
      .select($"event_type", $"n", $"q1", $"q3", $"n_outliers")
      .as[(String, Long, Double, Double, Long)].collect().toSet
    assert(out == Set(("a", 9L, 3.0, 7.0, 1L)))
  }

  test("zValue interleaves bits; zOrderStats bounds both dims per range") {
    import graft.operators.Layout
    // golden: a=0b101 (odd positions), b=0b011 (even positions)
    // z = 1<<5 | 0<<3 | 1<<1 | 0<<4 | 1<<2 | 1<<0 = 32+2+4+1 = 39
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 8).as("z"))
      .as[Long].collect().head
    assert(z == 39L)

    val df = (0 until 256).map(i => (i.toLong % 16, i.toLong / 16))
      .toDF("a", "b")
    val stats = Layout.zOrderStats(df, "a", "b", bits = 4, nRanges = 4)
      .select($"z_range", $"n_rows", $"min_a", $"max_a", $"min_b", $"max_b")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.map(_._2).sum == 256L)
    // Z property: each quarter of z space is a 8x8 quadrant pair —
    // both dims bounded to half their range, never the full extent
    stats.foreach { case (r, _, minA, maxA, minB, maxB) =>
      assert(maxA - minA <= 7 && maxB - minB <= 7,
        s"range $r spans a=[$minA,$maxA] b=[$minB,$maxB]")
    }
  }

  test("zOrderLayout: written files bound BOTH dims tighter than id order") {
    import graft.operators.Layout
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, (i * 2654435761L % 64), (i * 40503L % 64))
    }.toDF("id", "a", "b")

    def fileSpans(d: org.apache.spark.sql.DataFrame, dir: String): Seq[(Long, Long)] = {
      d.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(max($"a") - min($"a"), max($"b") - min($"b"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    }

    val base = java.nio.file.Files.createTempDirectory("graft_zo").toString
    try {
      val zSpans = fileSpans(
        Layout.zOrderLayout(df, $"a", $"b", bits = 6, numFiles = 16),
        s"$base/z")
      val idSpans = fileSpans(df.repartitionByRange(16, $"id"), s"$base/id")
      def meanArea(s: Seq[(Long, Long)]) =
        s.map { case (x, y) => (x + 1.0) * (y + 1.0) }.sum / s.length
      // id-ordered files see the full 64x64 domain; z-ordered files see
      // bounded rectangles — at least 4x tighter on average
      assert(meanArea(zSpans) * 4 < meanArea(idSpans),
        s"z=${meanArea(zSpans)} id=${meanArea(idSpans)}")
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(base)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("tokenBudgetSelect: crossing doc kept, order deterministic, budget reached") {
    val docs = (0L until 40L).map(i => (i, ("w " * (i.toInt % 7 + 1)).trim))
      .toDF("doc_id", "text")
    val sel = Sampling.tokenBudgetSelect(docs, budget = 50L)
      .orderBy("cum_tokens")
      .select("doc_id", "n_tokens", "cum_tokens")
      .as[(Long, Long, Long)].collect()
    // running total is consistent and the cut straddles the budget:
    // last kept doc crosses (or the corpus ran out), all before it start
    // strictly below budget
    assert(sel.nonEmpty)
    sel.foldLeft(0L) { case (prev, (_, n, cum)) =>
      assert(cum == prev + n); cum
    }
    val last = sel.last
    assert(last._3 >= 50L, "cut must reach the budget when tokens exist")
    assert(last._3 - last._2 < 50L, "crossing doc starts before the budget")
    assert(sel.init.forall(r => r._3 < 50L), "only ONE doc may cross")
    // determinism: same cut on re-run (md5 order, no RNG)
    val again = Sampling.tokenBudgetSelect(docs, budget = 50L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == sel.map(_._1).toSet)
  }

  test("assignClusters: nearest centroid wins, ties go to the smaller index") {
    import graft.operators.Similarity
    val cents = Array(
      Array(1.0, 0.0), Array(0.0, 1.0),
      Array(1.0, 0.0)) // duplicate of 0: any vector ties 0-vs-2
    val vecs = Seq(
      (1L, Array(0.9f, 0.1f)),  // nearest centroid 0
      (2L, Array(0.1f, 0.9f)),  // nearest centroid 1
      (3L, Array(0.5f, 0.5f)))  // exact tie 0-vs-1-vs-2 → 0
    val got = Similarity.assignClusters(
        vecs.toDF("vec_id", "embedding"), cents)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("densityPrune: hardest-first per-cluster quota, ceil + id tie-break") {
    import graft.operators.Similarity
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val vecs = Seq(
      // cluster 0, distances to (1,0): id1 far, id2 mid, id3 near
      (1L, Array(2.0f, 0.5f)), (2L, Array(0.5f, 0.25f)),
      (3L, Array(0.9f, 0.0f)),
      // cluster 1, 2 members: quota ceil(0.5*2)=1, keep the far one
      (4L, Array(0.0f, 0.2f)), (5L, Array(0.0f, 0.9f)),
      // equidistant pair in cluster 0 (mirror images around (1,0)):
      // same d², so the SMALLER id wins the last quota slot
      (6L, Array(0.7f, 0.3f)), (7L, Array(0.7f, -0.3f)))
    val got = Similarity.densityPrune(
        vecs.toDF("vec_id", "embedding"), cents, keepFrac = 0.5)
      .as[(Long, Int)].collect().toMap
    // cluster 0 has 5 members → quota 3: id1 (farthest), id2, then the
    // 6-vs-7 tie → 6. cluster 1 keeps id4 (0.8 away beats 0.1).
    assert(got == Map(1L -> 0, 2L -> 0, 6L -> 0, 4L -> 1))
    // keepFrac=1.0 keeps everything (quota never rounds below n)
    val all = Similarity.densityPrune(
      vecs.toDF("vec_id", "embedding"), cents, keepFrac = 1.0)
    assert(all.count() == 7L)
    // data-scarce regime: keepHardest=false flips the rank — cluster 1's
    // single slot now goes to the PROTOTYPICAL id5 (0.1 away), not id4
    val easy = Similarity.densityPrune(
        vecs.toDF("vec_id", "embedding"), cents, keepFrac = 0.5,
        keepHardest = false)
      .as[(Long, Int)].collect().toMap
    assert(easy.get(5L).contains(1) && !easy.contains(4L))
    // decimal quota arithmetic: 0.07 · 100 must quota 7, not the 8 the
    // IEEE double product (7.000000000000001) would ceil to
    val c100 = (0 until 100).map(i => (i.toLong, Array(1.0f + 0.001f * i, 0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.densityPrune(c100, Array(Array(1.0, 0.0)),
      keepFrac = 0.07).count() == 7L)
  }

  test("densityPruneApprox: sort-free plan, quota within tolerance") {
    import graft.operators.Similarity
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // 200 vectors per cluster with distinct distances (no boundary ties)
    val vecs = (0 until 400).map { i =>
      val t = 0.001f * i
      if (i % 2 == 0) (i.toLong, Array(1.0f + t, t))
      else (i.toLong, Array(t, 1.0f + t))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val approx = Similarity.densityPruneApprox(df, cents, keepFrac = 0.5)
    // no Sort node anywhere — the point of the escape hatch
    val headers = approx.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.map(_.trim).toSeq
    assert(!headers.exists(_.matches("""\(\d+\) Sort""")),
      "threshold prune must not sort")
    val kept = approx.as[(Long, Int)].collect()
    val perCluster = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // exact data through an exact-capacity sketch: both clusters keep
    // 100 ± sketch-boundary slack
    assert(perCluster.values.forall(k => k >= 95 && k <= 105),
      s"kept-per-cluster out of tolerance: $perCluster")
    // agreement with the exact rank path on this tie-free fixture
    val exact = Similarity.densityPrune(df, cents, keepFrac = 0.5)
      .as[(Long, Int)].collect().toSet
    val agree = kept.count(exact.contains).toDouble / exact.size
    assert(agree >= 0.95, s"agreement with exact path only $agree")
    // the data-scarce mode selects the OTHER half: same quota
    // tolerance, near-disjoint from the hard half (median boundary only)
    val easy = Similarity.densityPruneApprox(df, cents, keepFrac = 0.5,
      keepHardest = false).as[(Long, Int)].collect()
    val easyCounts = easy.groupBy(_._2).view.mapValues(_.length).toMap
    assert(easyCounts.values.forall(k => k >= 95 && k <= 105),
      s"easy-mode kept-per-cluster out of tolerance: $easyCounts")
    val hardIds = kept.map(_._1).toSet
    assert(easy.count(r => hardIds(r._1)) <= 10,
      "easy and hard halves must only overlap at the threshold boundary")
  }

  test("quantileBins handles scores at the clamp edges") {
    val df = Seq((1L, -0.5), (2L, 0.0), (3L, 1.0), (4L, 2.5), (5L, 0.5))
      .toDF("doc_id", "score")
    val got = Sampling.quantileBins(df, col("score"), nbins = 5)
      .select("doc_id", "rank").as[(Long, Long)].collect().toMap
    // rank order follows score order even outside [0,1)
    assert(got == Map(1L -> 1L, 2L -> 2L, 5L -> 3L, 3L -> 4L, 4L -> 5L))
  }
}
