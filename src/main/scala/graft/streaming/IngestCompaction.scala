package graft.streaming

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Fold-in compaction for the per-epoch `ingest_batch=<id>` append
  * directories the streaming index ingests accumulate
  * ([[StreamOps.nearDupIngestStream]]'s band-index appends + pair
  * epochs, [[StreamOps.annIngestStream]]'s PQ code appends).
  *
  * Why it exists: every micro-batch adds one partition, and the near-dup
  * epoch re-lists and re-unions `base ∪ all earlier appends` — a
  * year-long ingest pays file-listing and small-file overhead LINEAR in
  * epoch count (the one unbounded-growth path the round-11 audit found
  * in a deployment shape). Compaction rewrites all aged partitions
  * (`ingest_batch ≤ upToEpoch`) into a single partition keyed by the
  * HIGHEST folded epoch, so partition count stays bounded by the
  * compaction cadence while every reader contract survives unchanged:
  *
  *  - the epoch-exclusion screen (`ingest_batch < id` on the index side
  *    of [[StreamOps.nearDupIngestEpoch]]) still holds — folded rows
  *    carry the max FOLDED epoch `k ≤ upToEpoch`, and `upToEpoch` is
  *    restricted to COMMITTED epochs, so every possible in-flight or
  *    replayed epoch id satisfies `k < id`;
  *  - a replayed epoch's own dynamic-partition overwrite touches only
  *    its `ingest_batch=id` partition, which is never a fold target
  *    (folding it would require `id ≤ upToEpoch`, i.e. a committed
  *    epoch — committed epochs never replay);
  *  - row content is preserved verbatim (union of the folded
  *    partitions), so served results — band-bucket joins, PQ top-k,
  *    drained pair sets — are byte-identical before and after.
  *
  * Why the fold lands INSIDE the append dir rather than into the base
  * index: the base artifact is commonly SHARED (several queries serve
  * from one persisted index snapshot) and may live on read-only or
  * differently-owned storage; mutating it from a stream's maintenance
  * path would corrupt every other reader. Folding appends into appends
  * bounds growth identically and leaves the base immutable.
  *
  * == Crash safety (the [[BlockSink.compactBucket]] marker recipe) ==
  *
  * A run stages the folded partition into a HIDDEN sibling
  * (`.compact_fold.tmp` — dot-prefixed, skipped by partition discovery,
  * so concurrent readers never double-count), then brackets the
  * destructive window with a `_folding` marker whose CONTENT lists the
  * epochs being folded (written via temp-file + atomic rename, so a
  * torn marker can never be observed). Ordering:
  *
  *  1. write fold rows → `.compact_fold.tmp/ingest_batch=<k>` (parquet
  *     commit drops `_SUCCESS` inside the tmp);
  *  2. atomically publish the marker listing the folded epochs;
  *  3. delete each folded `ingest_batch=<e>` partition;
  *  4. rename the staged partition into place;
  *  5. delete tmp + marker.
  *
  * A crash before (2) leaves the originals intact and an inert tmp —
  * [[recover]] rolls BACK by deleting it. A crash at-or-after (2) is
  * always rolled FORWARD: the marker proves staging completed, so
  * [[recover]] finishes the deletes (idempotent), performs the rename
  * if still pending, and cleans up. A new [[compact]] run REFUSES to
  * start while a marker exists (run [[recover]] first) — the same
  * detectable-not-silent contract as BlockSink.
  *
  * == Single-maintenance-writer contract ==
  *
  * At most one compactor per directory, never concurrent with an epoch
  * that READS the fold range (the near-dup epoch's index-side union) or
  * WRITES any folded partition. The streaming integration satisfies
  * this for free: `compactEvery` runs the fold inside `foreachBatch`,
  * serialized with every epoch's reads and writes by the micro-batch
  * loop itself, with `upToEpoch = id − 1` (epoch `id − 1` is committed
  * before epoch `id` starts — Structured Streaming's batch ordering).
  */
object IngestCompaction {

  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)
  private def fs(spark: SparkSession, dir: String) =
    hp(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val Tmp = ".compact_fold.tmp"
  private val Marker = "_folding"

  /** Epoch ids present as `ingest_batch=<id>` partitions of `dir`
    * (empty if the dir does not exist yet — a stream that has not
    * written its first epoch).
    */
  def listEpochs(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    if (!f.exists(hp(dir))) Seq.empty
    else f.listStatus(hp(dir)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("ingest_batch="))
      .map(_.stripPrefix("ingest_batch=").toLong)
      .sorted
  }

  /** Fold every `ingest_batch ≤ upToEpoch` partition of `dir` into one
    * partition keyed by the highest folded epoch. No-op when fewer than
    * two such partitions exist. `orderCols` sorts the folded files
    * (range-partitioned into `targetFiles`) so serving scans keep
    * row-group pruning on those columns — pass the downstream join /
    * probe keys (`list` for PQ codes, `band_idx, band_key` for band
    * rows); empty keeps a plain `repartition(targetFiles)`.
    *
    * `upToEpoch` MUST only cover committed epochs (see the class doc) —
    * from inside `foreachBatch(id)` that means `id − 1` at most.
    */
  def compact(spark: SparkSession, dir: String, upToEpoch: Long,
      targetFiles: Int = 1, orderCols: Seq[String] = Nil): Unit = {
    require(targetFiles > 0, "targetFiles must be positive")
    val f = fs(spark, dir)
    val marker = hp(s"$dir/$Marker")
    if (f.exists(marker))
      throw new java.io.IOException(
        s"compact: prior fold of $dir did not complete — run " +
          "IngestCompaction.recover first")
    val epochs = listEpochs(spark, dir).filter(_ <= upToEpoch)
    if (epochs.size < 2) return // nothing to fold
    val k = epochs.max
    val tmp = hp(s"$dir/$Tmp")
    f.delete(tmp, true) // a pre-marker crash leaves an inert tmp
    // read ONLY the fold range (partition-pruned off the inferred
    // ingest_batch column) and rewrite it under the single epoch k
    val folded0 = spark.read.parquet(dir)
      .filter(col("ingest_batch") <= upToEpoch)
      .withColumn("ingest_batch", lit(k))
    val folded =
      if (orderCols.isEmpty) folded0.repartition(targetFiles)
      else folded0.repartitionByRange(targetFiles, orderCols.map(col): _*)
        .sortWithinPartitions(orderCols.map(col): _*)
    folded.write.mode(SaveMode.Overwrite)
      .partitionBy("ingest_batch").parquet(tmp.toString)
    writeMarkerAtomically(f, dir, epochs)
    epochs.foreach(e => f.delete(hp(s"$dir/ingest_batch=$e"), true))
    if (!f.rename(hp(s"$tmp/ingest_batch=$k"), hp(s"$dir/ingest_batch=$k")))
      throw new java.io.IOException(
        s"compact: cannot swap folded partition into $dir (state is " +
          "recoverable — run IngestCompaction.recover)")
    f.delete(tmp, true)
    f.delete(marker, false)
  }

  /** Roll a directory a crashed [[compact]] left mid-protocol back to a
    * consistent state (idempotent — run before retrying):
    *
    *  - marker present → staging had completed: roll FORWARD — finish
    *    deleting the folded partitions listed in the marker, rename the
    *    staged partition in if still pending, drop tmp + marker;
    *  - no marker, stale tmp → pre-marker crash: roll BACK by deleting
    *    the inert tmp (originals were never touched).
    */
  def recover(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val marker = hp(s"$dir/$Marker")
    val tmp = hp(s"$dir/$Tmp")
    if (f.exists(marker)) {
      val epochs = readMarker(f, dir)
      require(epochs.nonEmpty, s"recover: empty fold marker in $dir")
      val k = epochs.max
      val staged = hp(s"$dir/$Tmp/ingest_batch=$k")
      val target = hp(s"$dir/ingest_batch=$k")
      if (f.exists(staged)) {
        epochs.foreach(e => f.delete(hp(s"$dir/ingest_batch=$e"), true))
        if (!f.rename(staged, target))
          throw new java.io.IOException(s"recover: cannot swap $staged in")
      } else if (!f.exists(target))
        // the staged partition is gone AND the target is missing: the
        // fold rows exist nowhere — refuse to guess (the appends' source
        // stream can rebuild, but silently dropping epochs cannot be
        // the default)
        throw new java.io.IOException(
          s"recover: $dir has a fold marker but neither staged nor " +
            "swapped-in partition — manual inspection required")
      // else: rename already happened; deletes below are idempotent
      epochs.filter(_ != k)
        .foreach(e => f.delete(hp(s"$dir/ingest_batch=$e"), true))
      f.delete(tmp, true)
      f.delete(marker, false)
    } else f.delete(tmp, true)
  }

  /** Marker = the folded epoch list, one id per line, published via
    * temp-file + rename so a reader (i.e. [[recover]]) can never observe
    * a torn list — rolling forward with a PARTIAL epoch list would
    * delete some originals while the staged fold still contains them
    * all, duplicating the survivors.
    */
  private def writeMarkerAtomically(f: org.apache.hadoop.fs.FileSystem,
      dir: String, epochs: Seq[Long]): Unit = {
    val tmp = hp(s"$dir/.$Marker.tmp")
    val out = f.create(tmp, true)
    try out.write(epochs.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, hp(s"$dir/$Marker")))
      throw new java.io.IOException(s"compact: cannot publish fold marker in $dir")
  }

  private def readMarker(f: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[Long] = {
    val in = f.open(hp(s"$dir/$Marker"))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).map(_.toLong).toList
    finally in.close()
  }
}
