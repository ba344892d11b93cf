package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Reference timing for [[controlSample]] on an IDLE host — the floor
    * estimate so drift = 1.0 means "clean host" and drift > 1 measures
    * contention. Re-measured 2026-08-16 (round 16) via
    * `runMain graft.Bench --control-floor` (min-of-5 per fresh JVM,
    * first sample discarded as control-JIT): four runs on the idle
    * round-16 container read mins 0.775 / 1.141 / 1.211 / 0.801 s, so
    * the anchor is the cross-run MIN 0.775 — contention and VM throttle
    * only ever inflate a fixed workload, so the min is the host's true
    * floor. History (machines change per round; see PERF.md "control
    * anchor"): round-10 host 0.490 (the previous anchor, recorded
    * 2026-08-14), round-15 container fresh-JVM floor 0.645. The control
    * workload below is FROZEN — raw Spark primitives, no graft code, no
    * fixture dependence — so its time moves with host state only, and
    * `drift = control_s / ControlRefSec` normalizes cross-round totals:
    * a reader divides the bench total by `drift` before comparing
    * against a recorded prior (cross-round comparisons against pre-r16
    * artifacts must first rescale by 0.775/0.490 = 1.58).
    */
  private val ControlRefSec = 0.775

  /** The FROZEN canary subset: exactly the 46 queries of the round-1
    * artifact (`BENCH_r01.json`, total 92.97 s on the round-1 host) —
    * the registry has since grown 4.5×, so the only raw-total
    * comparison that measures the ENGINE rather than the registry size
    * is over this fixed subset. The bench tail reports `canary_total_s`
    * (sum of the per-query minimums over these names); the contract
    * (BASELINE.md) is canary_total ≤ 2 × 92.97 s after drift
    * normalization. Do NOT edit this list — it is the round-1 artifact
    * verbatim, and its value is that it never changes.
    */
  private val CanaryRefSec = 92.966
  private[graft] val CanaryQueries: Set[String] = Set(
    "a2_adjacent_pattern", "a2_sequence3", "a3_netflow",
    "a3_netflow_monitor", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_representatives", "dedup_simhash",
    "flagship_raw_netflow", "j1_frontier", "j1_frontier_registered",
    "j1_high_water", "j2_block_align", "j2_flush_events",
    "j4_ordered_merge", "mm_attach", "mm_features", "mm_frames",
    "p2_abi_roundtrip", "p2_decode_props", "p3_address_hex",
    "pipeline_prep", "q14_promo_revenue", "q18_big_orders",
    "q1_pricing_summary", "q3_segment_revenue", "q5_nation_revenue",
    "q6_forecast_revenue", "q_rollup_revenue", "q_setop_repeat_customers",
    "q_window_running", "s1_log_scan", "s3_chunked_scan",
    "s5_hybrid_phases", "sim_neardup_brute", "sim_neardup_lsh",
    "sim_topk_brute", "sim_topk_ivf", "sim_topk_lsh", "text_fingerprint",
    "text_langid", "text_quality", "text_token_stats",
    "w1_tumbling_window", "w2_per_block")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JIT + codegen + shuffle machinery, so per-query timings
    // measure the queries, not session startup
    spark.range(2000000L).selectExpr("sum(id * 2)").collect()
    // scale fixtures may carry only a table subset (gen_scale_fixture) —
    // warm whichever of the two biggest tables exists
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    catch { case _: org.apache.spark.sql.AnalysisException =>
      spark.read.parquet(s"$sfDir/documents.parquet").limit(1).count()
    }

    // ---- same-day host control (PERF.md: intraday drift is 10-25%,
    // and has exceeded 1.7x across sessions — raw tails are unreadable
    // without a same-run normalizer) ----
    def controlSample(): Double = {
      // the control must read HOST state, not JVM state: mid-run
      // samples land right after heavy queries, when the heap is full
      // and a GC pause lands inside the measured window (observed: a
      // mid-run control min of 1.23 s while a fresh JVM on the same
      // idle host reads 0.67 s). One explicit collection before the
      // clock starts removes the query-history dependence.
      System.gc()
      val t0 = System.nanoTime()
      // CPU leg: codegen'd arithmetic fold over a range
      spark.range(30000000L).selectExpr("sum(id * 3 + (id % 7))").collect()
      // shuffle leg: hash-aggregate across a real exchange
      spark.range(3000000L).selectExpr("id % 100000 as k", "id as v")
        .groupBy("k").sum("v").selectExpr("sum(k)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // controls are INTERLEAVED across the run (one up front, one after
    // each third of the query list, one at the end) and the MIN is the
    // drift denominator: contention INFLATES a fixed workload, never
    // deflates it, so the min is the run's best estimate of the host
    // floor. Round 14 exposed the old three-up-front sampling — the
    // control swung 1.29–1.65 across runs whose raw totals held within
    // 1.5%, because a contention burst during the control window
    // mis-normalized the whole run (VERDICT r14 Next #6).
    // Calibration mode (`runMain graft.Bench --control-floor`): sample
    // the frozen control N times on an otherwise-idle host and print the
    // min — the reproducible recipe behind ControlRefSec, so the anchor
    // can be re-measured (and its doc comment re-dated) whenever the
    // host floor visibly moves instead of silently conflating machine
    // aging with contention (round-15 verdict Next #4).
    if (args.contains("--control-floor")) {
      controlSample() // discard: first sample JIT-compiles the control's own codegen (~6 s)
      val samples = (1 to 5).map(_ => controlSample())
      println(s"""{"metric":"control_floor","samples":[${samples.mkString(",")}],"min":${samples.min},"anchor":$ControlRefSec}""")
      spark.stop()
      return
    }

    var controlSamples = List(controlSample())

    // per-query priors (seconds) from the last recorded full run: any
    // query whose FIRST sample lands >5x its prior takes a third sample,
    // so a single scheduler hiccup cannot write an outlier into the tail
    val priors: Map[String, Double] = {
      val f = new java.io.File("bench_priors.json")
      if (!f.exists()) Map.empty
      else try {
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = m.readTree(f)
        val it = node.fields()
        val b = Map.newBuilder[String, Double]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
        b.result()
      } catch { case _: Throwable => Map.empty }
    }

    var failed = List.empty[String]
    // optional args = subset of query names (local iteration aid)
    val only = args.toSet
    // min-of-2 per query, plus a THIRD sample when (a) the best is still
    // >= 1 s — where host noise dominates the recorded tail — or (b) the
    // first sample landed >5x the recorded prior (outlier guard)
    val queryList = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    // control checkpoints after each third of the list (and at the end)
    val controlAfter: Set[Int] =
      if (queryList.size < 3) Set(queryList.size - 1)
      else Set(queryList.size / 3 - 1, 2 * queryList.size / 3 - 1,
        queryList.size - 1)
    val results = queryList.zipWithIndex
      .map { case ((name, fn), qIdx) =>
        def sample(): Option[Double] = {
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).count(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              false
            }
          // stop the clock BEFORE cache teardown — clearCache cost is
          // bench hygiene, not query time
          val elapsed = (System.nanoTime() - t0) / 1e9
          // operators may persist internally (LSH signature reuse); drop
          // all storage between runs so accumulation can't skew timings
          CacheScope.releaseAllStorage(spark)
          if (ok) Some(elapsed) else None
        }
        val base = (1 to 2).flatMap(_ => sample())
        val outlier = base.headOption.exists(first =>
          priors.get(name).exists(p => p > 0 && first > 5 * p))
        val times =
          if (base.nonEmpty && (base.min >= 1.0 || outlier)) base ++ sample()
          else base
        // a query that succeeds on any run has a time — only record a
        // failure when EVERY run failed (driver treats the lists as disjoint)
        if (times.isEmpty) failed ::= name
        if (controlAfter(qIdx)) controlSamples ::= controlSample()
        name -> times
      }
    val controlS = controlSamples.min
    val drift =
      if (ControlRefSec > 0) controlS / ControlRefSec else 1.0
    // Contention diagnostics for the recorded artifact (round-15 verdict
    // Next #5: the driver's r15 capture ran at drift 2.67 and the cause
    // was unknowable after the fact). Count OTHER JVMs resident on the
    // host at close — a leftover test/probe JVM is the one contention
    // source a round-close sequence can actually eliminate, so the
    // artifact now records whether the run was clean by construction.
    val competingJvms =
      try {
        // exclude self AND the ancestor chain (sbt launches runMain as a
        // forked child JVM — the parent sbt JVM is part of THIS run, not
        // contention)
        var mine = Set.empty[Long]
        var h: java.util.Optional[ProcessHandle] =
          java.util.Optional.of(ProcessHandle.current())
        while (h.isPresent) { mine += h.get.pid(); h = h.get.parent() }
        ProcessHandle.allProcesses().filter { p =>
          !mine.contains(p.pid()) &&
            p.info().command().map[Boolean](_.contains("java")).orElse(false)
        }.count()
      } catch { case _: Throwable => -1L }
    val succeeded = results.collect { case (k, ts) if ts.nonEmpty => k -> ts.min }
    // 4-decimal (0.1 ms) per-query times: the driver's artifact capture
    // keeps only the tail of the printed line, and at 200+ queries the
    // full-precision dict alone overflows it (every BENCH_r≤17.json has
    // "parsed": null) — trimming buys back ~2 kB with no information
    // loss at bench granularity (round-17 verdict Next #4)
    val qs = succeeded.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val fs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // failed queries are listed in `failed`, never summed into the total
    val total = succeeded.map(_._2).sum
    // two FULL-RUN totals next to the min-based headline (round-16
    // verdict Next #6): every query already samples twice, so summing
    // the first samples and the second samples reconstructs two
    // complete passes over the registry — the artifact shows both raw
    // passes plus the per-query-min total, making a one-pass contention
    // burst diagnosable from the artifact alone (a clean run has all
    // three within a few percent; min ≤ both by construction)
    val totalFirst = results.flatMap(_._2.headOption).sum
    val totalSecond = results.flatMap { case (_, ts) =>
      ts.drop(1).headOption.orElse(ts.headOption) }.sum
    // frozen-canary total: the 46 round-1 queries only (CanaryQueries),
    // so the 2x-of-baseline contract is measured on a FIXED subset that
    // registry growth cannot inflate (round-16 verdict Next #2)
    val canary = succeeded.filter { case (k, _) => CanaryQueries(k) }
    val canaryTotal = canary.map(_._2).sum
    // a canary query that failed EVERY sample silently shrinks
    // canary_total_s (it sums succeeded queries only) and would weaken
    // the 2× gate — surface the intersection explicitly so the contract
    // (BASELINE.md: canary_n == 46 AND canary_failed == []) is checkable
    // from the artifact alone
    val canaryFailed = failed.filter(CanaryQueries).sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // The large per-query dict goes FIRST and every summary field LAST:
    // the driver's artifact capture keeps the tail of the line, so the
    // headline total / control / drift must sit after the dict or they
    // get truncated out of BENCH_r{N}.json (round-10 verdict Next #1).
    val line = s"""{"queries":$qs,"failed":$fs,"metric":"total","value":$total,"unit":"sec","total_s":$total,"total_first_s":$totalFirst,"total_second_s":$totalSecond,"canary_total_s":$canaryTotal,"canary_n":${canary.size},"canary_failed":$canaryFailed,"canary_ref_s":$CanaryRefSec,"n_queries":${succeeded.size},"control_s":$controlS,"control_ref_s":$ControlRefSec,"drift":$drift,"competing_jvms":$competingJvms,"sf":"$sfDir"}"""
    // repo-side twin of the printed line (round-17 verdict Next #4): the
    // driver's tail capture truncates the dict, so the full artifact is
    // ALSO written to a git-tracked file — BENCH_r{N}.json's "parsed":
    // null stops losing the per-query map. Full runs only: a subset run
    // (args-filtered) must not overwrite the last complete picture.
    if (only.isEmpty) {
      val w = new java.io.PrintWriter("bench_last.json")
      try w.println(line) finally w.close()
    }
    println(line)
    spark.stop()
  }
}
