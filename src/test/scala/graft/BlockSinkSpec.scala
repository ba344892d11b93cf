package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RpcLogSource, SimEthNode}
import graft.streaming.BlockSink

/** S7 write path: idempotent block-bucketed parquet ingest + compaction
  * (reference exactly-once contract, eth_event_stream/src/sink.rs:20).
  */
class BlockSinkSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = TestSpark.tempDir("graft-sink")

  private def rows(blocks: Range, perBlock: Int = 2) =
    blocks.flatMap(b => (0 until perBlock).map(i => (b.toLong, i.toLong, b * 10L + i)))
      .toDF("block_number", "log_index", "v")

  test("replaying the same epoch is a no-op (dynamic overwrite per " +
      "(bucket, epoch))") {
    val out = tmp()
    val batch = rows(0 until 20)
    BlockSink.writeBatch(batch, batchId = 7L, out, bucketBlocks = 16L)
    val first = spark.read.parquet(out)
      .select($"block_number", $"log_index", $"v").as[(Long, Long, Long)]
      .collect().toSet
    BlockSink.writeBatch(batch, batchId = 7L, out, bucketBlocks = 16L)
    val second = spark.read.parquet(out)
      .select($"block_number", $"log_index", $"v").as[(Long, Long, Long)]
      .collect().toSet
    assert(second == first, "replay duplicated rows")
    assert(first.size == 40)
  }

  test("distinct epochs sharing a block bucket never clobber each other") {
    val out = tmp()
    // bucketBlocks=16: epoch 0 writes blocks 0..9 (bucket 0), epoch 1
    // writes 10..19 (buckets 0 AND 1) — both land in bucket 0
    BlockSink.writeBatch(rows(0 until 10), batchId = 0L, out, bucketBlocks = 16L)
    BlockSink.writeBatch(rows(10 until 20), batchId = 1L, out, bucketBlocks = 16L)
    val got = spark.read.parquet(out)
      .select($"block_number").distinct().as[Long].collect().toSet
    assert(got == (0L until 20L).toSet,
      "an epoch's dynamic overwrite clobbered a neighbour epoch in the same bucket")
  }

  test("crash replay: a partial attempt's files are exactly replaced") {
    val out = tmp()
    val full = rows(0 until 20) // epoch 3's true content: buckets 0 and 1
    // crashed attempt flushed only bucket 0's half before dying
    BlockSink.writeBatch(full.filter($"block_number" < 16), batchId = 3L,
      out, bucketBlocks = 16L)
    // Spark replays epoch 3 with the same rows
    BlockSink.writeBatch(full, batchId = 3L, out, bucketBlocks = 16L)
    val got = spark.read.parquet(out)
      .select($"block_number", $"log_index", $"v").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got.size == got.distinct.size, "crash replay duplicated rows")
    assert(got.size == 40, "crash replay dropped rows")
  }

  test("streaming ingest + restart from checkpoint: exactly-once " +
      "(block_number, log_index) coverage in the FILES") {
    val ckpt = tmp()
    val out = tmp()
    def run(head: Long): Unit = {
      RpcLogSource.registerTransport("fake_sink_restart",
        new SimEthNode(head = head, logsPerBlock = 2))
      val stream = spark.readStream.format("graft.sources.RpcLogProvider")
        .option("transport", "fake_sink_restart").option("confirmations", "0")
        .option("blockStep", "4").load()
        .select($"block_number", $"log_index",
          graft.functions.abi.u256($"data").cast("bigint").as("v"))
      val q = BlockSink.start(stream, out, ckpt, bucketBlocks = 8L)
      try q.processAllAvailable() finally q.stop()
    }
    run(head = 13L) // kill mid-chain
    run(head = 25L) // restart, node advanced
    val keys = spark.read.parquet(out)
      .select($"block_number", $"log_index").as[(Long, Long)].collect().toSeq
    val expected = for (b <- 0L to 25L; i <- 0L to 1L) yield (b, i)
    assert(keys.size == keys.distinct.size, "restart re-emitted committed ranges")
    assert(keys.toSet == expected.toSet, "restart dropped or invented ranges")
    // the layout a reader prunes on: block buckets of 8
    val buckets = spark.read.parquet(out)
      .select($"block_bucket".cast("long")).distinct().as[Long].collect().toSet
    assert(buckets == (0L to 3L).toSet)
  }

  test("compactBucket: content identical, files fewer, other buckets intact") {
    val out = tmp()
    // many epochs into bucket 0 → many small file sets
    (0 until 6).foreach(e =>
      BlockSink.writeBatch(rows(e * 2 until (e + 1) * 2), batchId = e.toLong,
        out, bucketBlocks = 16L))
    BlockSink.writeBatch(rows(16 until 18), batchId = 6L, out, bucketBlocks = 16L)
    val before = spark.read.parquet(out)
      .select($"block_number", $"log_index", $"v", $"block_bucket".cast("long"))
      .collect().toSet
    def dataFiles(dir: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(dir))
    }
    val filesBefore = dataFiles(s"$out/block_bucket=0").size
    assert(filesBefore >= 6, "expected one file set per epoch before compaction")

    BlockSink.compactBucket(spark, out, bucket = 0L, targetFiles = 1)

    val after = spark.read.parquet(out)
      .select($"block_number", $"log_index", $"v", $"block_bucket".cast("long"))
      .collect().toSet
    assert(after == before, "compaction changed the data")
    assert(dataFiles(s"$out/block_bucket=0").size == 1)
    // compacted files live under the sentinel epoch, keeping a uniform
    // two-level layout so root-level partition discovery still works
    assert(new java.io.File(s"$out/block_bucket=0/ingest_batch=-1").isDirectory)
    assert(dataFiles(s"$out/block_bucket=1").nonEmpty, "neighbour bucket touched")
  }

  test("double-compact is content-stable; a reader planned mid-compaction " +
      "still resolves (old files or new, never a torn mix)") {
    val out = tmp()
    (0 until 4).foreach(e =>
      BlockSink.writeBatch(rows(e * 2 until (e + 1) * 2), batchId = e.toLong,
        out, bucketBlocks = 16L))
    val before = spark.read.parquet(out)
      .select($"block_number", $"log_index", $"v").collect().toSet

    BlockSink.compactBucket(spark, out, bucket = 0L, targetFiles = 2)
    // a reader whose plan was built BEFORE the second compaction captured
    // the pre-swap file list: it must either return the full consistent
    // set or fail CLEANLY with a missing-file error (retryable) — never a
    // torn mix of old and new files
    val planned = spark.read.parquet(out)
      .select($"block_number", $"log_index", $"v")
    BlockSink.compactBucket(spark, out, bucket = 0L, targetFiles = 1)
    try assert(planned.collect().toSet == before,
      "reader planned across a compaction saw torn data")
    catch { case e: org.apache.spark.SparkException =>
      assert(e.getMessage.contains("FILE_NOT_EXIST") ||
        e.getMessage.contains("does not exist"), e.getMessage)
    }
    // a reader planned AFTER the swap sees the consistent new view
    assert(spark.read.parquet(out)
      .select($"block_number", $"log_index", $"v").collect().toSet == before,
      "double-compact changed the data")
  }

  test("crashed compactor: marker/staged state refuses a new run instead " +
      "of deleting the only copy; recoverBucket restores each crash state") {
    val out = tmp()
    BlockSink.writeBatch(rows(0 until 4), batchId = 0L, out, bucketBlocks = 16L)
    val want = spark.read.parquet(out)
      .select($"block_number", $"log_index", $"v").collect().toSet
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)

    // state A: crash mid-write — marker + tmp exist, bucket intact
    fs.create(p(s"$out/_compacting_0"), false).close()
    fs.mkdirs(p(s"$out/.compact_0.tmp"))
    val exA = intercept[java.io.IOException](
      BlockSink.compactBucket(spark, out, bucket = 0L, targetFiles = 1))
    assert(exA.getMessage.contains("recoverBucket"), exA.getMessage)
    BlockSink.recoverBucket(spark, out, bucket = 0L)
    assert(!fs.exists(p(s"$out/_compacting_0")))
    assert(!fs.exists(p(s"$out/.compact_0.tmp")))
    assert(spark.read.parquet(out)
      .select($"block_number", $"log_index", $"v").collect().toSet == want)

    // state B: crash BETWEEN the renames — bucket dir gone, .old is the
    // only copy. A fresh compact must refuse (the pre-fix code deleted
    // .old here: data loss); recover must restore the bucket.
    BlockSink.compactBucket(spark, out, bucket = 0L, targetFiles = 1)
    fs.create(p(s"$out/_compacting_0"), false).close()
    assert(fs.rename(p(s"$out/block_bucket=0"), p(s"$out/.compact_0.old")))
    intercept[Exception](
      BlockSink.compactBucket(spark, out, bucket = 0L, targetFiles = 1))
    assert(fs.exists(p(s"$out/.compact_0.old")),
      "a refused run must not touch the staged-out copy")
    // the staging dirs are HIDDEN (dot-prefixed): a concurrent reader
    // planned mid-crash must neither double-read the bucket nor have
    // the block_bucket partition type flip to string (regression:
    // unhidden block_bucket=N.old siblings were parsed as partitions)
    val midCrash =
      try Some(spark.read.parquet(out))
      catch {
        // single-bucket fixture: with bucket 0 staged out NOTHING is
        // visible — exactly right, the hidden dirs must not serve reads
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => None
      }
    midCrash.foreach { df =>
      assert(df.schema.fieldNames.contains("block_bucket") &&
        df.schema("block_bucket").dataType !=
          org.apache.spark.sql.types.StringType,
        "an unhidden staging sibling flipped the partition type to string")
      assert(df.filter($"block_bucket" === 0L).count() == 0L,
        "bucket 0 is staged out mid-crash: hidden dirs must not serve reads")
    }
    BlockSink.recoverBucket(spark, out, bucket = 0L)
    assert(spark.read.parquet(out)
      .select($"block_number", $"log_index", $"v").collect().toSet == want,
      "recover lost the staged-out copy")

    // state C: crash after swap-in, before cleanup — both dirs exist;
    // recover keeps the live one and drops .old
    fs.mkdirs(p(s"$out/.compact_0.old"))
    BlockSink.recoverBucket(spark, out, bucket = 0L)
    assert(!fs.exists(p(s"$out/.compact_0.old")))
    assert(spark.read.parquet(out)
      .select($"block_number", $"log_index", $"v").collect().toSet == want)

    // recovered state compacts cleanly again
    BlockSink.compactBucket(spark, out, bucket = 0L, targetFiles = 1)
    assert(spark.read.parquet(out)
      .select($"block_number", $"log_index", $"v").collect().toSet == want)
  }
}
