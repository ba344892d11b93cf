package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.sketches

/** Mergeable-sketch operators — the bounded-memory summaries a 100 TB
  * pipeline computes in one pass where an exact answer would need a
  * full shuffle.
  *
  * No reference counterpart (extension surface, like the dedup/ANN
  * family): the reference's only aggregate is the netflow fold
  * (eth_event_stream/examples/stream_multi.rs:33-70). Heavy-hitter
  * detection is the skew-detection primitive behind the salted
  * aggregation escape hatch ([[EventLog.saltedNetflow]]) — at scale you
  * sketch FIRST to find the hot keys, then salt exactly those.
  *
  * Everything here rides Spark's own `count_min_sketch` aggregate
  * (map-side partial sketches, one small binary merged at the
  * reducer — no row shuffle) plus the native [[graft.functions.CmsEstimate]]
  * probe; the candidate set is the caller's (sketches estimate counts,
  * they don't enumerate keys).
  */
object Sketches {

  /** Default count-min eps (additive overcount ≤ eps·N): shared by
    * [[cmsSketch]] and the [[heavyHitters]] survivor-size certificate —
    * the two must agree or the bound is unsound.
    */
  private val CmsDefaultEps = 1e-4

  /** One-row DataFrame holding a count-min sketch of `key` —
    * `eps`·N additive overcount with probability `confidence`, never an
    * undercount. Partial sketches build map-side per partition and merge
    * associatively: the shuffle is O(sketch bytes × partitions),
    * independent of row count or key cardinality.
    */
  def cmsSketch(df: DataFrame, key: Column, eps: Double = CmsDefaultEps,
      confidence: Double = 0.99, seed: Int = 42): DataFrame =
    df.agg(
      count_min_sketch(key, lit(eps), lit(confidence), lit(seed))
        .as("cms"),
      count(lit(1)).as("n_rows"))

  /** Probe every row of `candidates` against the (single-row) sketch:
    * appends `est_count` (and the sketch's `n_rows` for error-bound
    * math). The sketch is collected once (a one-row planning action,
    * like broadcasting a scalar) and embedded as a plan LITERAL: the
    * probe is then a map-only projection with no join, and every row
    * hands [[graft.functions.CmsRuntime]] the same blob instance, so
    * the executor-side cache hits on identity — no per-row copy or
    * content compare of the ~MB blob.
    */
  def cmsProbe(sketch: DataFrame, candidates: DataFrame,
      key: Column): DataFrame = {
    val row = sketch.select(col("cms"), col("n_rows")).head
    candidates
      .withColumn("est_count",
        sketches.cmsEstimate(lit(row.getAs[Array[Byte]]("cms")), key))
      .withColumn("n_rows", lit(row.getAs[Long]("n_rows")))
  }

  /** One-pass column profiling (the ANALYZE-style summary a pipeline
    * runs before planning dedup/mixing over an unknown table): per
    * column, row/non-null/distinct counts and typed min/max — numeric
    * extremes in `min_num`/`max_num`, string extremes in
    * `min_str`/`max_str`, the other pair null. All statistics fold in a
    * single aggregation (map-side partials; the multi-`countDistinct`
    * plans via Expand — [[profileApprox]] is the registered 100 TB tier
    * that collapses it to one sketch pass), then one `stack` unpivots
    * the 1-row result — no per-column scans.
    */
  def profile(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String]): DataFrame =
    profileWith(df, numericCols, stringCols, "profile",
      c => countDistinct(col(c)))

  /** The 100 TB tier of [[profile]]: identical output shape except
    * `n_distinct` is `approx_count_distinct` (HLL++, default rsd 5%).
    * The exact profile's multi-`countDistinct` plans via Expand — one
    * row-multiplying duplication of the scan per distinct column — while
    * the sketches fold in ONE ordinary map-side-mergeable aggregation
    * pass: profiling cost becomes a single scan regardless of how many
    * columns are profiled. Registered gated (`meta_profile_approx`),
    * like every approximate operator in the engine.
    */
  def profileApprox(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String], rsd: Double = 0.05): DataFrame =
    profileWith(df, numericCols, stringCols, "profileApprox",
      c => approx_count_distinct(col(c), rsd))

  /** The one profiling implementation: exact and approximate tiers
    * differ ONLY in the distinct-count aggregate, so the output shape
    * can never diverge between them.
    */
  private def profileWith(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String], name: String,
      distinctAgg: String => Column): DataFrame = {
    val cols = numericCols.map((_, true)) ++ stringCols.map((_, false))
    require(cols.nonEmpty, s"$name: no columns given")
    val aggs = cols.flatMap { case (c, isNum) =>
      Seq(count(col(c)).as(s"${c}__nn"),
        distinctAgg(c).as(s"${c}__nd")) ++
        (if (isNum) Seq(min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"))
        else Seq(min(col(c)).as(s"${c}__smin"),
          max(col(c)).as(s"${c}__smax")))
    }
    val agged = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacks = cols.map { case (c, isNum) =>
      if (isNum)
        s"'$c', __n, `${c}__nn`, `${c}__nd`, `${c}__min`, `${c}__max`, " +
          "CAST(NULL AS STRING), CAST(NULL AS STRING)"
      else
        s"'$c', __n, `${c}__nn`, `${c}__nd`, CAST(NULL AS DOUBLE), " +
          s"CAST(NULL AS DOUBLE), `${c}__smin`, `${c}__smax`"
    }.mkString(", ")
    agged.selectExpr(s"stack(${cols.size}, $stacks) AS " +
      "(col_name, n_rows, n_nonnull, n_distinct, min_num, max_num, " +
      "min_str, max_str)")
  }

  /** Keys whose sketched count clears `minCount`, verified exactly in a
    * second pass over only the surviving candidates — the classic
    * sketch-then-verify heavy-hitter shape. `candidates` defaults to the
    * distinct keys of `df` (exact mode); pass a pre-thinned candidate
    * set (e.g. per-partition top-k) to keep the probe sub-linear at
    * scale. Because count-min never undercounts, the sketch pass has NO
    * false negatives: the verify pass only discards, never misses.
    */
  def heavyHitters(df: DataFrame, key: Column, minCount: Long,
      candidates: Option[DataFrame] = None,
      maxBroadcastKeys: Long = 1L << 22): DataFrame = {
    // collect the one-row sketch here (not via cmsProbe) so its n_rows
    // also feeds the broadcast-size bound without a second aggregation
    val skRow = cmsSketch(df, key).select(col("cms"), col("n_rows")).head
    val nRows = skRow.getAs[Long]("n_rows")
    val cand = candidates.getOrElse(df.select(key.as("hh_key")).distinct())
    val survivors = cand
      .withColumn("est_count", graft.functions.sketches.cmsEstimate(
        lit(skRow.getAs[Array[Byte]]("cms")), col("hh_key")))
      .filter(col("est_count") >= minCount)
      .select("hh_key")
    // exact verify over survivors only: the semi-join keeps the big
    // side's scan but aggregates just the candidate keys. Heavy hitters
    // are SELECTIVE by definition; but a low minCount (or the default
    // all-distinct-keys candidates on a high-cardinality key) can leave
    // survivors near full cardinality, where an unconditional broadcast
    // blows the driver. The analytic certificate must account for sketch
    // FALSE POSITIVES, not just true heavy hitters: count-min overcounts
    // by ≤ eps·N (per key, at the sketch confidence), so every SURVIVOR
    // has true count ≥ minCount − eps·N, and survivors number ≤
    // N / (minCount − eps·N) — provided minCount clears the eps·N slack
    // at all. When minCount ≲ eps·N (the reviewer case: low threshold on
    // a huge table) the sketch passes nearly every candidate and NO
    // analytic bound exists — pay the sizing count. 4× budget headroom
    // absorbs the (1 − confidence) stragglers beyond the eps bound.
    val fpSlack = (CmsDefaultEps * nRows).toLong
    val surelySmall = minCount > fpSlack &&
      nRows / math.max(minCount - fpSlack, 1L) <= maxBroadcastKeys / 4
    val side =
      if (surelySmall) broadcast(survivors)
      else {
        // operator-internal persist (minHashLshPairs contract:
        // Verify/Bench clear caches per query; CacheScope releases it
        // for scoped callers): sizing count + verify join read one
        // materialization of the probe pipeline
        val p = graft.CacheScope.persist(survivors)
        if (p.count() <= maxBroadcastKeys) broadcast(p) else p
      }
    df.select(key.as("hh_key"))
      .join(side, Seq("hh_key"), "left_semi")
      .groupBy("hh_key").agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") >= minCount)
  }
}
