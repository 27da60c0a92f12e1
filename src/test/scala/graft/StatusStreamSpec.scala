package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{JobState, StatusEvent, StatusStream}

class StatusStreamSpec extends SparkSpec {
  import spark.implicits._

  test("T2 state machine walks submitted→…→terminal and absorbs at terminal") {
    implicit val sq = spark.sqlContext
    val source = MemoryStream[StatusEvent]
    val query = StatusStream.trackJobs(source.toDS())
      .writeStream.format("memory").queryName("job_states")
      .outputMode(OutputMode.Update()).start()

    // micro-batch 1: two jobs advance at different speeds
    source.addData(
      StatusEvent("j1", "submitted", 1), StatusEvent("j1", "validating", 2),
      StatusEvent("j2", "submitted", 1))
    query.processAllAvailable()

    // micro-batch 2: j1 completes; j2 hits an unknown status
    source.addData(
      StatusEvent("j1", "in_progress", 3), StatusEvent("j1", "finalizing", 4),
      StatusEvent("j1", "completed", 5),
      StatusEvent("j2", "expired", 3))
    query.processAllAvailable()

    // micro-batch 3: post-terminal + late events must be ignored
    source.addData(
      StatusEvent("j1", "in_progress", 6),  // after terminal
      StatusEvent("j2", "submitted", 0))    // late (ts older than state)
    query.processAllAvailable()
    query.stop()

    // Update mode emits one row per touched job per batch; the LAST row
    // per job is the final state.
    val finalStates = spark.table("job_states").as[JobState].collect()
      .groupBy(_.job_id).map { case (k, rows) =>
        k -> rows.maxBy(s => (s.since, s.transitions))
      }

    val j1 = finalStates("j1")
    assert(j1.status === "completed")
    assert(j1.terminal)
    assert(j1.transitions === 4) // submitted→validating→in_progress→finalizing→completed
    assert(j1.since === 5)

    val j2 = finalStates("j2")
    assert(j2.status === "unknown_expired")
    assert(!j2.terminal)
    assert(j2.since === 3) // the late ts=0 event did not roll state back
  }

  test("T1 terminal filter isolates finished jobs (poll exit condition)") {
    val states = Seq(
      JobState("a", "completed", 5, 3, terminal = true),
      JobState("b", "in_progress", 4, 2, terminal = false)).toDS()
    val done = StatusStream.terminalOnly(states).collect()
    assert(done.map(_.job_id).toSeq === Seq("a"))
  }

  test("events within one batch apply in ts order") {
    // all events in a single micro-batch — the fold must still walk in
    // ts order, not arrival order
    implicit val sq = spark.sqlContext
    val source = MemoryStream[StatusEvent]
    val query = StatusStream.trackJobs(source.toDS())
      .writeStream.format("memory").queryName("job_states2")
      .outputMode(OutputMode.Update()).start()
    source.addData(
      StatusEvent("x", "completed", 9),
      StatusEvent("x", "submitted", 1),
      StatusEvent("x", "in_progress", 5))
    query.processAllAvailable()
    query.stop()
    val s = spark.table("job_states2").as[JobState].collect().head
    assert(s.status === "completed")
    assert(s.transitions === 2)
  }

  test("T1 end-to-end: poll stream feeds the tracking log; latestState converges") {
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-poll").toString
    val source = MemoryStream[StatusEvent]
    // spec trigger is fast; production default keeps the reference's 300 s
    // cadence (auto_translate.py:362-374)
    val q = StatusStream.pollToTracking(source.toDS(), s"$dir/log",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"),
      checkpointDir = Some(s"$dir/cp"))

    source.addData(StatusEvent("j1", "submitted", 1), StatusEvent("j2", "submitted", 1))
    q.processAllAvailable()
    source.addData(StatusEvent("j1", "in_progress", 2),
      StatusEvent("j1", "completed", 3), StatusEvent("j2", "failed", 2))
    q.processAllAvailable()
    source.addData(StatusEvent("j1", "in_progress", 9)) // post-terminal: absorbed
    q.processAllAvailable()
    q.stop()

    // the append-only S9 log compacts (S10) to exactly the final states
    val latest = graft.operators.Tracking.latestState(
      graft.operators.Tracking.readLog(spark, s"$dir/log"), col("timestamp"))
    val byJob = latest.collect().map(r =>
      r.getAs[String]("job_id") -> ((r.getAs[String]("status"), r.getAs[Long]("timestamp")))).toMap
    assert(byJob("j1") === (("completed", 3L)))
    assert(byJob("j2") === (("failed", 2L)))
  }

  test("S10 MERGE-shaped sink: micro-batches upsert the compacted state table") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-merge").toString
    val source = MemoryStream[StatusEvent]
    val q = StatusStream.pollToState(source.toDS(), s"$dir/state",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"),
      checkpointDir = Some(s"$dir/cp"))

    source.addData(StatusEvent("j1", "submitted", 1), StatusEvent("j2", "submitted", 1))
    q.processAllAvailable()
    source.addData(StatusEvent("j1", "in_progress", 2),
      StatusEvent("j1", "completed", 3), StatusEvent("j2", "failed", 2))
    q.processAllAvailable()
    q.stop()

    def stateByJob() = graft.operators.Tracking.readState(spark, s"$dir/state")
      .collect().map(r =>
        r.getAs[String]("job_id") -> ((r.getAs[String]("status"), r.getAs[Long]("timestamp")))).toMap
    val after = stateByJob()
    // one row per job, already compacted — no log, no read-side window
    assert(graft.operators.Tracking.readState(spark, s"$dir/state").count() === 2)
    assert(after("j1") === (("completed", 3L)))
    assert(after("j2") === (("failed", 2L)))

    // post-crash replay: re-applying the final micro-batch's records by
    // hand (foreachBatch may see the same batch twice) leaves state fixed
    graft.operators.Tracking.upsert(
      StatusStream.toTrackingRecords(Seq(
        JobState("j1", "completed", 3, 2, terminal = true),
        JobState("j2", "failed", 2, 1, terminal = true)).toDS()),
      s"$dir/state")
    assert(stateByJob() === after)
  }
}
