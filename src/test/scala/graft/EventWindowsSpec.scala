package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.hash
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventWindows

case class Ev(ts: Timestamp, event_type: String)

class EventWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def at(hour: Int, min: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00")

  test("streaming tumbling counts equal the batch aggregation") {
    implicit val sq = spark.sqlContext
    val events = Seq(
      Ev(at(0), "view"), Ev(at(0, 30), "view"), Ev(at(0, 45), "click"),
      Ev(at(1), "view"), Ev(at(2), "click"), Ev(at(2, 15), "click"))

    val batch = EventWindows.tumblingCounts(events.toDF())
      .as[(Long, String, Long)].collect().toSet

    val source = MemoryStream[Ev]
    val q = EventWindows.tumblingCountsStream(source.toDS().toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update()).start()
    source.addData(events: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_counts")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("watermark drops events later than the allowed lateness") {
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Ev]
    val q = EventWindows.tumblingCountsStream(source.toDS().toDF(),
      width = "1 hour", lateness = "2 hours")
      .writeStream.format("memory").queryName("win_late")
      .outputMode(OutputMode.Update()).start()

    // batch 1 advances the watermark to 05:00 - 2h = 03:00
    source.addData(Ev(at(0), "view"), Ev(at(5), "view"))
    q.processAllAvailable()

    // batch 2: hour-0 event is older than the watermark → dropped;
    // hour-4 event is within lateness → counted
    source.addData(Ev(at(0, 10), "view"), Ev(at(4), "click"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_late").as[(Long, String, Long)].collect()
    val hour0 = at(0).getTime / 1000
    val hour4 = at(4).getTime / 1000
    // the hour-0 window was only ever emitted with count 1 (batch 1);
    // the dropped late event produced no update
    assert(rows.filter(_._1 == hour0).map(_._3).max === 1L)
    assert(rows.filter(_._1 == hour4).map(_._3).max === 1L)
  }

  test("W5 session windows split exactly at the gap, merge under it") {
    val rows = Seq(
      // user 1: three events with gaps <= 30 min -> ONE session (an exact
      // 30-min gap still merges: the interval is closed)
      (1L, at(0, 0)), (1L, at(0, 20)), (1L, at(0, 50)),
      // then a gap of 31 min -> NEW session
      (1L, at(1, 21)),
      // user 2: single event -> its own session
      (2L, at(5, 0)))
      .toDF("user_id", "ts")
    val got = EventWindows.sessionStats(rows, "30 minutes")
      .orderBy("user_id", "first_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    def us(h: Int, m: Int) = at(h, m).getTime * 1000L
    assert(got === Seq(
      (1L, us(0, 0), us(0, 50), 3L),
      (1L, us(1, 21), us(1, 21), 1L),
      (2L, us(5, 0), us(5, 0), 1L)))
  }

  test("W5 streaming sessionization equals the batch aggregation") {
    implicit val sq = spark.sqlContext
    val events = Seq(
      Ev(at(0), "view"), Ev(at(0, 10), "view"), Ev(at(1), "view"),
      Ev(at(1, 20), "click"), Ev(at(3), "view"))
    // key sessions by event_type for this spec (sessionStats groups on
    // user_id; rename to reuse the operator unchanged)
    val batchIn = events.toDF().withColumnRenamed("event_type", "user_id_s")
      .withColumn("user_id", hash($"user_id_s").cast("long")).drop("user_id_s")
    val batch = EventWindows.sessionStats(batchIn, "30 minutes")
      .as[(Long, Long, Long, Long)].collect().toSet

    val source = MemoryStream[Ev]
    val streamIn = source.toDS().toDF()
      .withColumnRenamed("event_type", "user_id_s")
      .withColumn("user_id", hash($"user_id_s").cast("long")).drop("user_id_s")
    val q = EventWindows.sessionStatsStream(streamIn, "30 minutes",
        lateness = "1 hour")
      .writeStream.format("memory").queryName("sess_stats")
      .outputMode(OutputMode.Append()).start()
    source.addData(events: _*)
    q.processAllAvailable()
    // append mode emits a session only once the watermark passes its end;
    // a far-future sentinel closes every real session (its own session
    // stays open and is deliberately never emitted)
    source.addData(Ev(at(20), "sentinel"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_stats")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed === batch)
  }
}
