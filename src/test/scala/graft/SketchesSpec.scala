package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Mergeable-sketch operators: count-min probe bounds and the
  * sketch-then-verify heavy-hitter shape.
  */
class SketchesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // skewed fixture: key k appears k times (1..40) → 820 rows
  private def skewed = (1 to 40).flatMap(k => Seq.fill(k)(k.toLong))
    .toDF("k")

  test("cms estimate never undercounts; overcount bounded by eps*N") {
    val df = skewed
    val sk = Sketches.cmsSketch(df, col("k"), eps = 0.01, confidence = 0.99)
    val truth = df.groupBy("k").agg(count(lit(1)).as("true_n"))
    val probed = Sketches.cmsProbe(sk, truth, col("k"))
    val rows = probed.select($"k", $"true_n", $"est_count", $"n_rows")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 40)
    rows.foreach { case (k, t, est, n) =>
      assert(est >= t, s"key $k undercounted: est=$est true=$t")
      assert(est <= t + math.ceil(0.01 * n).toLong,
        s"key $k overcounted past eps*N: est=$est true=$t n=$n")
    }
  }

  test("string keys probe through the same expression") {
    val df = Seq("a", "a", "b").toDF("s")
    val sk = Sketches.cmsSketch(df, col("s"))
    val est = Sketches.cmsProbe(sk, Seq("a", "b", "zz").toDF("s"), col("s"))
      .select($"s", $"est_count").as[(String, Long)].collect().toMap
    assert(est("a") == 2 && est("b") == 1 && est("zz") == 0)
  }

  test("heavy hitters: exact result, default and thinned candidate sets") {
    val df = skewed
    val out = Sketches.heavyHitters(df, col("k"), minCount = 30)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(out == (30L to 40L).map(k => k -> k))

    // a pre-thinned candidate set that MISSES a heavy key can only lose
    // that key (sketch-probe has no false negatives within candidates) —
    // the verify pass still returns exact counts for the rest
    val thin = Seq(40L, 35L, 3L).toDF("hh_key")
    val out2 = Sketches.heavyHitters(df, col("k"), minCount = 30,
        candidates = Some(thin))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(out2 == Seq(35L -> 35L, 40L -> 40L))
  }

  test("profile: one-pass stats with nulls, numeric and string columns") {
    val df = Seq(
      (Some(1L), Some("a"), Some(2.5)),
      (Some(2L), None, Some(-1.0)),
      (None, Some("b"), Some(2.5))
    ).toDF("id", "s", "v")
    val rows = Sketches.profile(df, numericCols = Seq("id", "v"),
        stringCols = Seq("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)), Option(r.get(5)),
        Option(r.get(6)), Option(r.get(7)))).toSet
    assert(rows == Set(
      ("id", 3L, 2L, 2L, Some(1.0), Some(2.0), None, None),
      ("v", 3L, 3L, 2L, Some(-1.0), Some(2.5), None, None),
      ("s", 3L, 2L, 2L, None, None, Some("a"), Some("b"))))
  }

  test("cms_estimate is exposed as a SQL function") {
    graft.plans.GraftFunctions.register(spark)
    skewed.createOrReplaceTempView("sk_skewed")
    val row = spark.sql(
      """WITH s AS (SELECT count_min_sketch(k, 0.01d, 0.99d, 42) AS cms
                    FROM sk_skewed)
         SELECT cms_estimate(cms, 40L) AS est FROM s""")
      .as[Long].collect().head
    assert(row >= 40L)
  }
}
