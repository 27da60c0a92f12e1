package graft

import org.apache.spark.sql.functions._
import graft.ext.RangeJoin

/** The bucketized range-join reduction must agree pair-for-pair with the
  * naive cross-join + filter definition, emit each qualifying pair
  * exactly once, honor inclusive bounds, and refuse degenerate spans.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq[(Long, String, Option[Long])](
    (1L, "u1", Some(100L)), (2L, "u1", Some(250L)), (3L, "u1", Some(1000L)),
    (4L, "u2", Some(100L)), (5L, "u2", Some(999L)),
    (6L, "u1", None)
  ).toDF("event_id", "user", "ts")

  private def intervals = Seq(
    (10L, "u1", 100L, 250L),   // multi-bucket at g=100, inclusive both ends
    (11L, "u1", 900L, 1100L),  // contains event 3 only
    (12L, "u2", 0L, 50L),      // contains nothing
    (13L, "u2", 95L, 105L),    // single bucket, contains event 4
    (14L, "u1", 300L, 200L)    // start > end: matches nothing
  ).toDF("iid", "user", "s", "e")

  test("agrees with cross-join + filter, each pair exactly once, bounds inclusive") {
    val got = RangeJoin.join(events, intervals, "ts", "s", "e",
        keys = Seq("user"), granularity = 100L)
      .select("event_id", "iid").as[(Long, Long)].collect().toSeq.sorted
    val naive = events.as("ev").crossJoin(intervals.as("iv"))
      .filter($"ev.user" === $"iv.user" && $"s" <= $"ts" && $"ts" <= $"e")
      .select("event_id", "iid").as[(Long, Long)].collect().toSeq.sorted
    assert(got === naive)
    // inclusive both ends: interval 10 picks up ts=100 AND ts=250
    assert(got.contains((1L, 10L)) && got.contains((2L, 10L)))
    // exactly-once: no pair repeats even when an interval spans buckets
    assert(got.distinct === got)
    // null ts (event 6) and the inverted interval (14) match nothing
    assert(!got.exists(_._1 == 6L) && !got.exists(_._2 == 14L))
  }

  test("pure containment join (no keys) works and matches naive") {
    val got = RangeJoin.join(events, intervals.drop("user"), "ts", "s", "e",
        granularity = 100L)
      .select("event_id", "iid").as[(Long, Long)].collect().toSeq.sorted
    val naive = events.crossJoin(intervals.drop("user"))
      .filter($"s" <= $"ts" && $"ts" <= $"e")
      .select("event_id", "iid").as[(Long, Long)].collect().toSeq.sorted
    assert(got === naive)
  }

  test("overlap join agrees with cross-join + filter, each pair exactly once") {
    def iv(p: String) = intervals.select($"iid".as(s"${p}iid"),
      $"user".as(s"${p}user"), $"s".as(s"${p}s"), $"e".as(s"${p}e"))
    val got = RangeJoin.overlapJoin(iv("a_"), iv("b_"),
        "a_s", "a_e", "b_s", "b_e", keys = Seq(("a_user", "b_user")),
        granularity = 100L)
      .select("a_iid", "b_iid").as[(Long, Long)].collect().toSeq.sorted
    val naive = iv("a_").crossJoin(iv("b_"))
      .filter($"a_user" === $"b_user" && $"a_s" <= $"b_e" && $"b_s" <= $"a_e")
      .select("a_iid", "b_iid").as[(Long, Long)].collect().toSeq.sorted
    assert(got === naive)
    // exactly-once even though overlapping intervals share many buckets
    assert(got.distinct === got)
    // self-pairs (a,a) appear for valid intervals (standard self-join);
    // the inverted interval 14 pairs with nothing, itself included
    assert(got.contains((10L, 10L)) && !got.exists(t => t._1 == 14L || t._2 == 14L))
  }

  test("degenerate interval span fails loudly instead of exploding") {
    val wide = Seq((20L, "u1", 0L, 10000000L)).toDF("iid", "user", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.join(events, wide, "ts", "s", "e", keys = Seq("user"),
        granularity = 1L, maxSpanBuckets = 1000).count()
    }
    assert(ex.getMessage != null)
  }
}
