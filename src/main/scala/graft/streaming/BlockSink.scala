package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** S7 write path — the durable side of the reference's sink contract.
  *
  * The reference sink promises its consumer each block EXACTLY ONCE —
  * "panic the moment it gets an event from a block it already published"
  * (eth_event_stream/src/sink.rs:20) — and hands flushes to a callback
  * (`stream_synced_events`, sink.rs:100-115). On a cluster the callback
  * is a distributed WRITE, and the failure mode the reference never
  * faces appears: a micro-batch can crash after writing some files, and
  * Spark replays the whole batch. A plain append sink would then
  * duplicate the replayed blocks for every external reader.
  *
  * This sink makes the replay idempotent instead of trying to make the
  * write atomic:
  *
  *  - rows are bucketed by block (`block_bucket = block / bucketBlocks`)
  *    — the directory layout a 100 TB reader needs anyway (block-range
  *    predicates partition-prune to the touched buckets);
  *  - each micro-batch writes with DYNAMIC partition overwrite keyed on
  *    `(block_bucket, ingest_batch)`: `ingest_batch` is the epoch id
  *    Spark REUSES when it replays a failed batch, so a replay
  *    overwrites exactly the files the crashed attempt left behind and
  *    never touches neighbouring batches that share a block bucket;
  *  - exactly-once end-to-end = the source's checkpointed block offsets
  *    (each range enters exactly one epoch) + this deterministic
  *    per-epoch rewrite.
  *
  * `ingest_batch` subdirectories are an ingest artifact: readers prune
  * on `block_bucket` alone, and `compactBucket` rewrites a bucket's
  * accumulated small files into few sorted ones once it is cold (blocks
  * past the confirmation horizon never change — buckets freeze).
  */
object BlockSink {

  /** Idempotent write of one (micro-)batch. Safe to call twice with the
    * same `batchId` + rows: the second call dynamically overwrites the
    * first call's `(block_bucket, ingest_batch)` partitions with
    * identical content. Distinct batches never clobber each other even
    * inside one block bucket.
    */
  def writeBatch(batch: DataFrame, batchId: Long, path: String,
      blockCol: String = "block_number",
      bucketBlocks: Long = 1000L): Unit = {
    require(bucketBlocks > 0, "bucketBlocks must be positive")
    if (!batch.isEmpty) {
      batch
        .withColumn("block_bucket",
          floor(col(blockCol) / lit(bucketBlocks)).cast("long"))
        .withColumn("ingest_batch", lit(batchId))
        .write
        .mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("block_bucket", "ingest_batch")
        .parquet(path)
    }
  }

  /** Start the streaming ingest: `stream` (any block-keyed frame — raw
    * logs or decoded events) drains into `path` under the idempotent
    * per-epoch rewrite above, offsets checkpointed at `checkpoint`.
    */
  def start(stream: DataFrame, path: String, checkpoint: String,
      blockCol: String = "block_number",
      bucketBlocks: Long = 1000L,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, path, blockCol, bucketBlocks)
      }
      .start()

  /** Rewrite one frozen bucket's small per-epoch files into
    * `targetFiles` block-sorted files (ingest leaves one file set per
    * epoch; a long-running tail accumulates hundreds per bucket, and
    * scan cost at 100 TB is dominated by file count × footer reads).
    * The rewrite stages into `<bucket>.compact.tmp` and swaps via two
    * renames, so a concurrent reader sees the old files or the new —
    * only run it on buckets past the confirmation horizon, where no
    * epoch can still append.
    */
  def compactBucket(spark: org.apache.spark.sql.SparkSession, path: String,
      bucket: Long, targetFiles: Int,
      blockCol: String = "block_number",
      orderCols: Seq[String] = Seq("block_number", "log_index")): Unit = {
    require(targetFiles > 0, "targetFiles must be positive")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketDir = new org.apache.hadoop.fs.Path(s"$path/block_bucket=$bucket")
    require(fs.exists(bucketDir), s"no such bucket: $bucketDir")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/block_bucket=$bucket.compact.tmp")
    val old = new org.apache.hadoop.fs.Path(s"$path/block_bucket=$bucket.old")
    fs.delete(tmp, true); fs.delete(old, true)
    val rows = spark.read.parquet(bucketDir.toString)
      // per-epoch split ends at compaction, but partition discovery
      // requires a UNIFORM directory depth across buckets — compacted
      // files keep the level under the sentinel epoch −1
      .withColumn("ingest_batch", lit(-1L))
      .repartitionByRange(targetFiles, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    rows.write.mode(SaveMode.Overwrite)
      .partitionBy("ingest_batch").parquet(tmp.toString)
    if (!fs.rename(bucketDir, old))
      throw new java.io.IOException(s"compact: cannot stage out $bucketDir")
    if (!fs.rename(tmp, bucketDir)) {
      fs.rename(old, bucketDir) // roll back
      throw new java.io.IOException(s"compact: cannot swap in $tmp")
    }
    fs.delete(old, true)
  }
}
