package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned at-rest layout for event logs: directory-partitioned by
  * `chunk_id = block DIV blockStep` — the storage twin of the reference's
  * `block_step` scan chunking (eth_event_stream/src/stream.rs:214-226).
  *
  * Why it matters at 100 TB: a block-range query prunes whole chunk
  * directories at PLANNING time (`PartitionFilters` in the scan, no
  * footer reads for pruned chunks), and ingest appends new chunks without
  * touching old ones — the append-only total order of the log maps to an
  * append-only directory sequence.
  */
object BlockStore {

  /** Write with chunk partitioning. `mode=append` adds later chunks. */
  def write(df: DataFrame, path: String, blockStep: Long = 1000L,
      mode: String = "overwrite"): Unit =
    df.withColumn("chunk_id", expr(s"block_number DIV $blockStep"))
      .write.mode(mode).partitionBy("chunk_id").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S1/S2 over the partitioned layout: the chunk-range predicate prunes
    * directories, the block-range predicate prunes row groups.
    */
  def rangeScan(spark: SparkSession, path: String,
      from: Long, to: Long, blockStep: Long = 1000L): DataFrame =
    read(spark, path).filter(
      col("chunk_id").between(from / blockStep, to / blockStep) &&
        col("block_number").between(from, to))
}

/** B3 — retry policy parity: exponential backoff from 10 ms with jitter,
  * 4 attempts (reference: eth_event_stream/src/stream.rs:148-150,
  * :160-166). Two sanctioned contexts: driver-side source RPC with the
  * defaults, and TRANSPORT-level transients inside executor tasks — there
  * callers pass a trimmed budget (e.g. `attempts = 3, initialDelayMs = 5`,
  * ≤ ~15 ms total sleep) so the in-task backoff absorbs connection blips
  * without stacking meaningfully under Spark's own task-retry layer,
  * which remains the authority for everything slower.
  */
object Retry {
  /** `retryIf` narrows WHICH non-fatal errors retry — deterministic
    * protocol errors (e.g. a node's range-limit rejection) should
    * propagate on the first attempt instead of burning the backoff
    * budget on a result that cannot change.
    */
  def withBackoff[T](
      attempts: Int = 4,
      initialDelayMs: Long = 10L,
      jitter: Double = 0.1,
      sleep: Long => Unit = Thread.sleep,
      retryIf: Throwable => Boolean = _ => true)(op: () => T): T = {
    require(attempts >= 1)
    var delay = initialDelayMs
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return op()
      catch {
        // never retry fatal errors; propagate interrupts with the flag set
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        case scala.util.control.NonFatal(e) if !retryIf(e) => throw e
        case scala.util.control.NonFatal(e) =>
          last = e
          if (i < attempts - 1) {
            // REAL per-call randomness: a jitter derived only from the
            // attempt index is identical in every task, so 200 executors
            // failing on one node blip would retry in synchronized
            // bursts — exactly what jitter exists to prevent
            val j = (delay * jitter * java.util.concurrent.ThreadLocalRandom
              .current().nextDouble()).toLong
            sleep(delay + j)
            delay *= 2
          }
      }
      i += 1
    }
    throw last
  }
}
