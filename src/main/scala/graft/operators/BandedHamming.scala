package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared banded Hamming-join core for 64-bit perceptual/content
  * fingerprints — the candidate-then-verify machinery behind BOTH
  * [[Multimodal.dHashNearDupPairs]] (image dHash) and
  * [[Dedup.simHashPairs]] (text SimHash): split the hash into `bands`
  * keys of `bandBits` bits, self-join per `(band_idx, band_key)`
  * bucket, verify with an exact `bit_count(xor)` over the full hash.
  *
  * The SCALE lesson (measured, PERF.md round 13): a FIXED band layout
  * fixes the band-key space, so coincidental collisions between
  * unrelated hashes grow as `bands · n² / 2^(bandBits+1)` — at 1.67M
  * docs the 4×16 layout spent 19× the time for 10× the rows while the
  * occupancy cap never engaged (average bucket n/2^16 ≈ 25). The key
  * space must scale with n: [[autoLayout]] switches past
  * [[ScaledLayoutMinDocs]] to 2 bands × 32 bits with radius-1
  * multi-index key probing ([[pairJoin]]'s `probeRadius`) on one join
  * side — the SAME ≤3-Hamming recall guarantee (some band has
  * per-band distance ≤ ⌊3/2⌋ = 1, the substring-probe argument of
  * multi-index hashing), with expected coincidental candidates down
  * `(2·33/2^32) / (4/2^16)` ≈ 4000×. Measured at the 1000× tier:
  * 183 → 24.7 s (dHash byte kernel), growth back to ~linear.
  */
private[graft] object BandedHamming {

  /** Corpus size where [[autoLayout]] switches to the scaled layout:
    * below it the 4×16 exact join is cheaper (no 33× probe-side
    * explode); above it the 2^16 key space is the quadratic term.
    * Crossover solves `4n + 3.1e-5·n² = 68n` → n ≈ 2M; 1M adds margin
    * for the candidate rows being ~4× wider than probe rows.
    */
  val ScaledLayoutMinDocs: Long = 1000000L

  /** `(bands, bandBits, probeRadius)` for `n` hashed documents — both
    * layouts carry the identical ≤3-Hamming completeness contract.
    */
  def autoLayout(n: Long): (Int, Int, Int) =
    if (n >= ScaledLayoutMinDocs) (2, 32, 1) else (4, 16, 0)

  /** Band rows for a single-`LONG` 64-bit hash column: one row per
    * `(doc_id, full-hash array, band_idx, band_key)` — band `b` is
    * bits `[b·bandBits, (b+1)·bandBits)`, little-endian, matching the
    * compiled dHash kernels' packing so [[pairJoin]] is kernel- and
    * operator-agnostic.
    */
  def bandRows(hashed: DataFrame, hashCol: String, bands: Int,
      bandBits: Int): DataFrame = {
    require(bands * bandBits == 64,
      s"bands x bandBits must cover the 64-bit hash, got $bands x $bandBits")
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    hashed
      .select(col("doc_id"),
        expr(s"transform(sequence(0, ${bands - 1}), " +
          s"b -> shiftright($hashCol, b * $bandBits) & ${mask}L)")
          .as("bands"))
      .select(col("doc_id"), col("bands"),
        posexplode(col("bands")).as(Seq("band_idx", "band_key")))
  }

  /** Candidate-then-verify pair join over band rows
    * (`doc_id`, `bands`, `band_idx`, `band_key`):
    * optional occupancy cap ([[Dedup.capBandBuckets]], on EXACT keys)
    * → optional radius-`probeRadius` multi-index probe on ONE side
    * (each band row also joins under every key within that Hamming
    * distance of its own — ball masks are plan-time literals in a
    * single codegen'd projection; symmetric, so one-sided probing
    * covers a qualifying pair either way) → per-bucket self-join →
    * pair dedup → exact full-hash Hamming ≤ `maxHamming`. A pair
    * within total distance `bands·(probeRadius+1) − 1` is guaranteed
    * to surface (pigeonhole on per-band distances).
    */
  def pairJoin(rows0: DataFrame, maxHamming: Int, bands: Int,
      bandBits: Int, probeRadius: Int, maxBucketSize: Option[Int],
      storage: Option[org.apache.spark.storage.StorageLevel]): DataFrame = {
    require(maxHamming >= 0, "maxHamming must be >= 0")
    require(probeRadius >= 0 && probeRadius <= 2,
      s"probeRadius must be 0..2 (ball size C($bandBits,<=r) explodes " +
        s"combinatorially past that), got $probeRadius")
    val rows1 = maxBucketSize.fold(rows0)(Dedup.capBandBuckets(rows0, _))
    // materialize once — a DataFrame self-join re-evaluates its lineage
    // per side, doubling the hash projection AND the occupancy window
    // (the minHashLshPairs persist rationale, same operator shape)
    val rows = storage.fold(rows1)(graft.CacheScope.persist(rows1, _))
    val probed =
      if (probeRadius == 0) rows
      else rows.select(col("doc_id"), col("bands"), col("band_idx"),
        explode(array(ballMasks(bandBits, probeRadius).map(m =>
          col("band_key").bitwiseXOR(lit(m))): _*)).as("band_key"))
    val hamming = (0 until bands)
      .map(i => bit_count(element_at(col("b1"), i + 1)
        .bitwiseXOR(element_at(col("b2"), i + 1))))
      .reduce(_ + _).cast("bigint")
    probed.as("a")
      .join(rows.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.bands").as("b1"), col("b.bands").as("b2"))
      .dropDuplicates("d1", "d2")
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select("d1", "d2", "hamming")
  }

  /** Incremental twin of [[pairJoin]] — [[Dedup.bandedNearDupPairs]]'
    * shape for Hamming fingerprints: `index` holds the EXISTING
    * corpus's band rows (persisted parquet in deployment — the old
    * side is never re-hashed or re-read beyond these narrow rows),
    * `newRows` the arriving shard's. One join covers new↔old AND
    * new↔new: the left side is old ∪ new, the right side only the new
    * shard, so every pair with ≥1 new endpoint shares a bucket here
    * and old↔old pairs never form. Pair orientation is normalized
    * (`least`/`greatest`) and the result EQUALS the full
    * [[pairJoin]] recompute over (old ∪ new) restricted to pairs
    * touching the shard — same verify, same cap semantics (occupancy
    * counted over the UNION, so the cap is stable as shards
    * accumulate; capping the left side alone suffices — a dropped
    * bucket's new-side rows find no left match). `probeRadius`
    * explodes the ball on the NEW side only (the smaller one).
    * Sides must be id-disjoint ([[Dedup.incrementalNearDupPairs]]'
    * contract).
    */
  def incrementalPairJoin(index: DataFrame, newRows: DataFrame,
      maxHamming: Int, bands: Int, bandBits: Int, probeRadius: Int,
      maxBucketSize: Option[Int],
      storage: Option[org.apache.spark.storage.StorageLevel]): DataFrame = {
    require(maxHamming >= 0, "maxHamming must be >= 0")
    require(probeRadius >= 0 && probeRadius <= 2,
      s"probeRadius must be 0..2, got $probeRadius")
    val cols = Seq("doc_id", "bands", "band_idx", "band_key").map(col)
    val newSide = storage.fold(newRows)(graft.CacheScope.persist(newRows, _))
    val all0 = index.select(cols: _*)
      .unionByName(newSide.select(cols: _*))
    val all1 = maxBucketSize.fold(all0)(Dedup.capBandBuckets(all0, _))
    val all = storage.fold(all1)(graft.CacheScope.persist(all1, _))
    val probed =
      if (probeRadius == 0) newSide
      else newSide.select(col("doc_id"), col("bands"), col("band_idx"),
        explode(array(ballMasks(bandBits, probeRadius).map(m =>
          col("band_key").bitwiseXOR(lit(m))): _*)).as("band_key"))
    val hamming = (0 until bands)
      .map(i => bit_count(element_at(col("b1"), i + 1)
        .bitwiseXOR(element_at(col("b2"), i + 1))))
      .reduce(_ + _).cast("bigint")
    all.as("a")
      .join(probed.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"),
        col("a.bands").as("b1"), col("b.bands").as("b2"))
      .dropDuplicates("d1", "d2")
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select("d1", "d2", "hamming")
  }

  /** Every XOR mask with popcount ≤ `radius` over `bandBits` bits —
    * the probe ball, enumerated at PLAN time. `|ball| = 1 + C(b,1)
    * [+ C(b,2)]` — 33 for the (32, 1) scaled layout.
    */
  private def ballMasks(bandBits: Int, radius: Int): Seq[Long] = {
    val r1 = (0 until bandBits).map(i => 1L << i)
    val r2 = if (radius < 2) Nil
      else for { i <- 0 until bandBits; j <- (i + 1) until bandBits }
        yield (1L << i) | (1L << j)
    0L +: (r1 ++ r2)
  }
}
