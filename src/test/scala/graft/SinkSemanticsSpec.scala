package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventLog

/** The reference's three sink unit tests replicated as golden DataFrame
  * fixtures (FIXTURES.md §1.1; reference: eth_event_stream/src/sink.rs:305-384).
  * Fixture rows: `(source, block_number, log_index, value)`.
  */
class SinkSemanticsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def fixture(rows: (String, Long, Long, Int)*) =
    rows.toDF("source", "block_number", "log_index", "value")

  // test_up_to (sink.rs:319-326): frontier None until all sources advance,
  // then min over high-water marks.
  test("min-watermark: None until every registered source has advanced") {
    val oneSource = fixture(("1", 3L, 0L, 0))
    assert(EventLog.frontierOf(oneSource, Seq("1", "2"), "source").count() == 0)

    val both = fixture(("1", 3L, 0L, 0), ("2", 4L, 0L, 0))
    val frontier = EventLog.frontierOf(both, Seq("1", "2"), "source")
      .as[Long].collect()
    assert(frontier.toSeq == Seq(3L))
  }

  // test_wait_until_included (sink.rs:332-354): batch analogue — with
  // source 1 at block 9 and source 2 at block 7 the frontier is exactly 7.
  test("barrier target: frontier is min of concurrent producers") {
    val rows =
      (1L to 9L).map(b => ("1", b, 0L, 0)) ++ (1L to 7L).map(b => ("2", b, 0L, 0))
    val frontier = EventLog.frontierOf(fixture(rows: _*), Seq("1", "2"), "source")
      .as[Long].collect()
    assert(frontier.toSeq == Seq(7L))
  }

  // test_flush (sink.rs:358-383): block-aligned flush materializes EMPTY
  // groups for absent sources and consumes data range-by-range.
  test("flush golden: empty groups materialized, ranges consumed in order") {
    val data = fixture(
      ("-7", 1L, 0L, 0), ("-5", 2L, 0L, 0),
      ("-7", 3L, 0L, 0), ("-5", 4L, 0L, 0))
    val sources = Seq("-7", "-5")

    def flush(bottom: Long, target: Long): Map[(Long, String), Seq[Long]] =
      EventLog.flushIncluding(data, sources, bottom, target, Seq("value"), "source")
        .collect()
        .map { r =>
          val evs = r.getSeq[Row](2).map(_.getLong(0))
          (r.getLong(0), r.getString(1)) -> evs
        }.toMap

    // flush(1) = [(0, {-5:[], -7:[]}), (1, {-5:[], -7:[idx 0]})]
    val f1 = flush(0L, 1L)
    assert(f1.keySet == Set((0L, "-5"), (0L, "-7"), (1L, "-5"), (1L, "-7")))
    assert(f1((0L, "-5")).isEmpty && f1((0L, "-7")).isEmpty)
    assert(f1((1L, "-5")).isEmpty)
    assert(f1((1L, "-7")) == Seq(0L))

    // flush(3) = [(2, {-5:[0], -7:[]}), (3, {-5:[], -7:[idx 0]})]
    val f3 = flush(2L, 3L)
    assert(f3((2L, "-5")) == Seq(0L) && f3((2L, "-7")).isEmpty)
    assert(f3((3L, "-7")) == Seq(0L) && f3((3L, "-5")).isEmpty)
  }

  // J4: union order must not affect the restored intra-block total order.
  test("ordered merge is invariant to source interleaving") {
    val a = fixture(("a", 1L, 0L, 10), ("a", 1L, 4L, 11), ("a", 2L, 1L, 12))
    val b = fixture(("b", 1L, 2L, 20), ("b", 2L, 0L, 21))

    def positions(streams: Seq[org.apache.spark.sql.DataFrame]) =
      EventLog.orderedMerge(streams, Seq("log_index"))
        .select("block_number", "pos_in_block", "log_index", "source")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
        .sortBy(r => (r._1, r._2))
        .toSeq

    val ab = positions(Seq(a, b))
    val ba = positions(Seq(b, a))
    assert(ab == ba)
    // block 1 order: idx 0 (a), idx 2 (b), idx 4 (a)
    assert(ab.filter(_._1 == 1L).map(_._3) == Seq(0L, 2L, 4L))
    assert(ab.filter(_._1 == 1L).map(_._4) == Seq("a", "b", "a"))
    // block 2 order: idx 0 (b), idx 1 (a)
    assert(ab.filter(_._1 == 2L).map(_._4) == Seq("b", "a"))
  }
}
