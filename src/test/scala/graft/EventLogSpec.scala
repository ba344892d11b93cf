package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventLog

/** Unit tests for the window/pattern/aggregate operators on tiny in-memory
  * event tables (schema mirrors the driver's `events` table).
  */
class EventLogSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** rows: (event_id, user_id, event_type, value); block keys derived. */
  private def ev(rows: (Long, Long, String, Double)*) =
    EventLog.withBlockKeys(
      rows.toDF("event_id", "user_id", "event_type", "value"))

  test("withBlockKeys derives the (block, log_index) composite key") {
    val d = ev((27L, 1L, "view", 0.0)).select("block_number", "log_index")
      .as[(Long, Long)].collect()
    assert(d.toSeq == Seq((2L, 7L)))
  }

  test("tumbling window: exact boundaries, no off-by-one (sink.rs:58-81)") {
    // blocks 0,1,2,3 (event_ids 5,15,25,35); step=2 from 0 ⇒ windows {0,1},{2,3}
    val d = ev((5L, 1L, "view", 1.0), (15L, 1L, "view", 2.0),
      (25L, 1L, "view", 4.0), (35L, 1L, "view", 8.0))
    val w = EventLog.tumblingWindow(d, 0L, 2L)
      .select("window_id", "n_events", "window_from", "window_to")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(w == Seq((0L, 2L, 0L, 1L), (1L, 2L, 2L, 3L)))
    intercept[IllegalArgumentException](EventLog.tumblingWindow(d, 0L, 0L))
  }

  test("adjacent pattern matches only consecutive pairs within a block") {
    // block 0: view(0) click(1)  → match
    // block 0: view(2) error(3) click(4) → no match (not adjacent)
    // view at end of block 0, click at start of block 1 → no match (cross-block)
    val d = ev(
      (0L, 1L, "view", 0.0), (1L, 1L, "click", 0.0),
      (2L, 1L, "view", 0.0), (3L, 1L, "error", 0.0), (4L, 1L, "click", 0.0),
      (9L, 1L, "view", 0.0), (10L, 1L, "click", 0.0))
    val m = EventLog.adjacentPattern(d, "view", "click")
      .as[(Long, Long)].collect().toSeq
    assert(m == Seq((0L, 1L)))
  }

  test("netflow: inflow adds, outflow subtracts, per key") {
    val d = ev(
      (0L, 1L, "purchase", 10.0), (1L, 1L, "click", 3.0),
      (2L, 2L, "click", 5.0), (3L, 3L, "purchase", 7.0),
      (4L, 4L, "view", 100.0)) // other types excluded
    val nf = EventLog.netflow(d, "purchase", "click")
      .withColumn("netflow", $"netflow".cast("double"))
      .as[(Long, Double)].collect().toMap
    assert(nf == Map(1L -> 7.0, 2L -> -5.0, 3L -> 7.0))

    val mon = EventLog.netflowMonitor(EventLog.netflow(d, "purchase", "click"))
      .as[(Long, Long, Long)].collect().head
    assert(mon == ((3L, 2L, 1L)))
  }

  test("netflow accumulates at decimal(38,2): wide sums stay exact, not null") {
    // each element fits decimal(18,2), but a large fold would overflow the
    // (28,2) sum type that summing 18,2 elements produces — the fold must
    // carry 38,2 headroom and stay exact (non-ANSI Spark silently nulls
    // overflowed decimal sums)
    val big = 9.9e15 // near the decimal(18,2) element ceiling
    val d = ev((0L until 200L).map(i => (i, 1L, "purchase", big)): _*)
    val nf = EventLog.netflow(d, "purchase", "click")
    val sumType = nf.schema("netflow").dataType
      .asInstanceOf[org.apache.spark.sql.types.DecimalType]
    assert(sumType.precision == 38 && sumType.scale == 2, s"got $sumType")
    val total = nf.select($"netflow".cast("string")).as[String].collect().head
    assert(total != null && BigDecimal(total) == BigDecimal(big) * 200)
    // salted twin keeps the same widened fold
    val salted = EventLog.saltedNetflow(d, "purchase", "click")
    assert(salted.schema("netflow").dataType == sumType)
  }

  test("sliding windows: size==slide degenerates to tumbling; overlap covers each block size/slide times") {
    val d = ev((0L until 200L).map(i => (i, 1L, "view", 1.0)): _*)
    val tumb = EventLog.tumblingWindow(d, 0L, 10L)
      .select($"window_id", $"n_events").as[(Long, Long)].collect().toSet
    val degen = EventLog.slidingWindow(d, 0L, 10L, 10L)
      .select($"window_id", $"n_events").as[(Long, Long)].collect().toSet
    assert(degen == tumb)
    // size=10, slide=5: every block in exactly 2 windows except the ramp-up
    val sl = EventLog.slidingWindow(d, 0L, 10L, 5L)
      .select($"window_id", $"n_events", $"window_from", $"window_to")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // blocks 0..19 (200 events / 10 per block): windows 0..3
    assert(sl.map(_._1).toSeq == (0L to 3L))
    assert(sl.head == ((0L, 100L, 0L, 9L)))   // ramp: blocks 0-9
    assert(sl(1) == ((1L, 100L, 5L, 14L)))    // blocks 5-14
    assert(sl(3) == ((3L, 50L, 15L, 19L)))    // tail: blocks 15-19
    // gap case slide > size: blocks in the gap appear in no window
    val gap = EventLog.slidingWindow(d, 0L, 5L, 10L)
      .agg(org.apache.spark.sql.functions.sum($"n_events"))
      .as[Long].collect().head
    assert(gap == 100L * 10 / 10) // only blocks ≡ 0..4 (mod 10) covered
  }

  test("sessionize: gaps over the threshold split sessions per key") {
    // user 1: blocks 0,1, 5 (gap 4 ≤ 5 → same), 20 (gap 15 > 5 → new)
    // user 2: single event
    val d = ev(
      (0L, 1L, "view", 0.0), (10L, 1L, "view", 0.0), (50L, 1L, "view", 0.0),
      (200L, 1L, "view", 0.0), (7L, 2L, "view", 0.0))
    val out = EventLog.sessionize(d, gapBlocks = 5L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out((1L, 0L)) == ((3L, 0L, 5L)))  // blocks 0,1,5 in one session
    assert(out((1L, 1L)) == ((1L, 20L, 20L)))
    assert(out((2L, 0L)) == ((1L, 0L, 0L)))
    assert(out.size == 3)
  }

  test("hybrid phase split at head - confirmations (stream.rs:263-301)") {
    // blocks 0..4; head=4, confirmations=2 ⇒ historical ≤2, live 3..4
    val d = ev((0L until 50L).map(i => (i, 1L, "view", 0.0)): _*)
    val phases = EventLog.hybridPhases(d, 2L)
      .select("phase", "from_block", "to_block")
      .as[(String, Long, Long)].collect()
      .map { case (p, f, t) => p -> ((f, t)) }.toMap
    assert(phases("historical") == ((0L, 2L)))
    assert(phases("live") == ((3L, 4L)))
  }

  test("blockAlign emits zero rows for registered-but-silent sources") {
    val d = ev((0L, 1L, "view", 1.0))
    val rows = EventLog.blockAlign(d, Seq("view", "click"), 0L, 1L)
      .select("block_number", "source", "n_events")
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set(
      (0L, "view", 1L), (0L, "click", 0L),
      (1L, "view", 0L), (1L, "click", 0L)))
  }

  test("asofJoin attaches the latest right event at-or-before, per key") {
    import org.apache.spark.sql.functions.col
    // user 1: views at 0 and 20, purchases at 10 and 30 — each purchase
    // sees the view just before it, never a later one; user 2's purchase
    // at 5 precedes their only view at 7 → no match (null payload)
    val d = ev(
      (0L, 1L, "view", 1.0), (10L, 1L, "purchase", 9.0),
      (20L, 1L, "view", 2.0), (30L, 1L, "purchase", 9.0),
      (5L, 2L, "purchase", 9.0), (7L, 2L, "view", 3.0))
    val out = EventLog.asofJoin(
        d.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "value"),
        d.filter(col("event_type") === "view"))
      .select("event_id", "matched_event_id", "matched_value")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(out == Set(
      (10L, Some(0L), Some(1.0)),
      (30L, Some(20L), Some(2.0)),
      (5L, None, None)))
  }

  test("rangeJoin: exact point-in-interval matches, no dup across buckets") {
    import org.apache.spark.sql.functions.col
    val points = Seq((1L, 0L), (2L, 5L), (3L, 64L), (4L, 100L), (5L, 129L))
      .toDF("pid", "p")
    // intervals spanning multiple buckets (width 64), adjacent, empty,
    // inverted (dropped), and containing bucket boundaries
    val intervals = Seq(
      (10L, 0L, 5L), (11L, 5L, 130L), (12L, 64L, 64L), (13L, 7L, 3L))
      .toDF("iid", "s", "e")
    val out = EventLog.rangeJoin(points, intervals, "p", "s", "e", 64L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 10L), (2L, 10L),                               // [0,5]
      (2L, 11L), (3L, 11L), (4L, 11L), (5L, 11L),        // [5,130]
      (3L, 12L)))                                        // [64,64]
    // the multi-bucket interval matched each point exactly once
    val counts = EventLog.rangeJoin(points, intervals, "p", "s", "e", 64L)
      .groupBy("pid", "iid").count().filter(col("count") > 1).count()
    assert(counts == 0)
  }

  test("rangeJoin fails loudly on corrupt oversized spans and reserved names") {
    import org.apache.spark.sql.functions.col
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val huge = Seq((10L, 0L, 1L << 40)).toDF("iid", "s", "e")
    val err = intercept[Exception](
      EventLog.rangeJoin(points, huge, "p", "s", "e", 64L).collect())
    assert(err.getMessage != null)
    val clash = points.withColumn("__bucket", col("p"))
    intercept[IllegalArgumentException](
      EventLog.rangeJoin(clash, huge, "p", "s", "e", 64L))
  }

  test("intervalOverlapJoin: exact overlaps, each pair matched once") {
    import org.apache.spark.sql.functions.col
    val a = Seq((1L, 0L, 5L), (2L, 60L, 70L), (3L, 100L, 300L))
      .toDF("aid", "as", "ae")
    val b = Seq(
      (10L, 5L, 60L),    // touches a1 at 5 and a2 at 60
      (11L, 71L, 99L),   // gap — overlaps nothing
      (12L, 0L, 400L),   // spans everything, crosses many buckets
      (13L, 299L, 301L)) // tail overlap with a3
      .toDF("bid", "bs", "be")
    val out = EventLog.intervalOverlapJoin(a, b, "as", "ae", "bs", "be", 64L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 10L), (2L, 10L),
      (1L, 12L), (2L, 12L), (3L, 12L),
      (3L, 13L)))
    val dups = EventLog.intervalOverlapJoin(a, b, "as", "ae", "bs", "be", 64L)
      .groupBy("aid", "bid").count().filter(col("count") > 1).count()
    assert(dups == 0)
  }

  test("asofJoin never matches NULL keys (SQL ASOF equality semantics)") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // null-keyed left rows flow through UNMATCHED; null-keyed right rows
    // match nothing (without the guard both land in one window partition
    // and match each other)
    val d = ev(
      (0L, 0L, "view", 5.0), (10L, 0L, "purchase", 9.0),
      (2L, 1L, "view", 1.0), (12L, 1L, "purchase", 9.0))
      .withColumn("user_id",
        when(col("user_id") === 0L, lit(null)).otherwise(col("user_id")))
    val out = EventLog.asofJoin(
        d.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "value"),
        d.filter(col("event_type") === "view"))
      .select("event_id", "matched_event_id", "matched_value")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(out == Set(
      (10L, None, None),           // null-keyed left: present, unmatched
      (12L, Some(2L), Some(1.0)))) // non-null keys unaffected
  }
}
