package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
    var failed = List.empty[String]
    // optional args = subset of query names (local iteration aid)
    val only = args.toSet
    // min-of-2 per query, plus a THIRD sample for queries whose best is
    // still ≥ 1 s — that is where host noise dominates the recorded tail
    // (PERF.md documents 10-25% same-day spread), so the extra sample
    // firms up the round-over-round regression signal cheaply: sub-second
    // queries don't pay it, and the slow ones amortize it
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
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
          // operators may persist internally (LSH signature reuse); drop the
          // cache between runs so accumulation can't skew later timings
          spark.catalog.clearCache()
          // clearCache does NOT free checkpoint RDDs (clusterLabels keeps
          // its final labels checkpoint alive); each run builds fresh
          // plans, so dropping every persistent RDD between runs is safe
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          if (ok) Some(elapsed) else None
        }
        val base = (1 to 2).flatMap(_ => sample())
        val times =
          if (base.nonEmpty && base.min >= 1.0) base ++ sample() else base
        // a query that succeeds on any run has a time — only record a
        // failure when EVERY run failed (driver treats the lists as disjoint)
        if (times.isEmpty) failed ::= name
        name -> times.minOption
      }
    val succeeded = results.collect { case (k, Some(v)) => k -> v }
    val qs = succeeded.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // failed queries are listed in `failed`, never summed into the total
    val total = succeeded.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
