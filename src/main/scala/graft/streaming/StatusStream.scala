package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, StreamingQuery, Trigger}
import graft.core.Schemas

/** One observed job-status event (what each poll of the external batch
  * service yields — auto_translate.py:362-374 polls every 300 s).
  */
case class StatusEvent(job_id: String, status: String, ts: Long)

/** Persisted per-job state (T2): the current status plus bookkeeping the
  * tracking table wants (BATCH_TRACKING_GUIDE.md:170-182 vocabulary).
  */
case class JobState(job_id: String, status: String, since: Long,
                    transitions: Int, terminal: Boolean)

/** T1/T2 — the poll-until-terminal loop re-expressed as Structured
  * Streaming (SURVEY.md §2.9): a stream of status observations keyed by
  * job_id drives a `mapGroupsWithState` state machine; the output stream
  * is the tracking-table upsert feed (S10). The reference's blocking
  * driver loop becomes `Trigger.ProcessingTime(300s)` on the source side;
  * the state machine itself is trigger-agnostic.
  *
  * Semantics (modeled on the reference's transition writes at
  * auto_translate.py:1821-1855 + T4 late/partial tolerance):
  *  - events apply in ts order within a micro-batch;
  *  - a terminal status (completed/failed/download_failed) absorbs — later
  *    events never change it;
  *  - late events (ts older than the current state) are ignored;
  *  - an unknown status string is recorded as "unknown_<status>", matching
  *    the reference's unknown_* vocabulary.
  */
object StatusStream {

  private val known: Set[String] =
    Schemas.statusOrder.toSet ++ Schemas.terminalStatuses

  def normalize(status: String): String =
    if (known.contains(status)) status else s"unknown_$status"

  /** Fold one micro-batch of events for one job into the persisted state. */
  def updateJob(jobId: String, events: Iterator[StatusEvent],
                state: GroupState[JobState]): JobState = {
    var cur = state.getOption.orNull
    events.toSeq.sortBy(e => (e.ts, e.status)).foreach { e =>
      val s = normalize(e.status)
      if (cur == null) {
        cur = JobState(jobId, s, e.ts, 0, Schemas.terminalStatuses.contains(s))
      } else if (!cur.terminal && e.ts >= cur.since && s != cur.status) {
        cur = JobState(jobId, s, e.ts, cur.transitions + 1,
          Schemas.terminalStatuses.contains(s))
      }
    }
    state.update(cur)
    cur
  }

  /** Wire the state machine over a (possibly streaming) event Dataset.
    * On a stream use output mode Update; each micro-batch emits the
    * refreshed state row per touched job — exactly the S10 upsert feed.
    */
  def trackJobs(events: Dataset[StatusEvent]): Dataset[JobState] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.job_id).mapGroupsWithState(updateJob _)
  }

  /** T1's stop condition as a predicate over the state stream: rows whose
    * job reached a terminal status (poll loop exit,
    * auto_translate.py:362-374).
    */
  def terminalOnly(states: Dataset[JobState]): Dataset[JobState] =
    states.filter(_.terminal)

  /** A refreshed-state batch as S10 partial tracking records (only
    * job_id/status/timestamp set; null = "unchanged", exactly the
    * Tracking.statusUpdate shape).
    */
  def toTrackingRecords(states: Dataset[JobState]): DataFrame =
    states.toDF().select(
      lit(null).cast("string").as("batch_id"),
      lit(null).cast("string").as("input_file"),
      col("job_id"), col("status"),
      col("since").as("timestamp"),
      lit(null).cast("string").as("target_language"),
      lit(null).cast("string").as("output_file"))

  /** T1 wired end-to-end (VERDICT r2 "Next round" #8): the reference's
    * blocking poll loop (sleep 300 s, check status, update tracking CSV —
    * auto_translate.py:362-374) as ONE streaming query: status events →
    * [[trackJobs]] state machine → per-micro-batch `foreachBatch` append
    * into the S9 tracking log. `Tracking.latestState` over that log is
    * then the oracle-checked S10 upsert view.
    *
    * Production wiring keeps the reference's cadence via the default
    * `Trigger.ProcessingTime(300s)`; specs drive it with a scripted
    * MemoryStream source and `processAllAvailable`, which fires
    * immediately regardless of trigger cadence.
    */
  def pollToTracking(events: Dataset[StatusEvent], logPath: String,
                     trigger: Trigger = Trigger.ProcessingTime("300 seconds"),
                     checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = trackJobs(events).writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[JobState], _: Long) =>
        graft.operators.Tracking.append(toTrackingRecords(batch), logPath)
      }
    checkpointDir.fold(writer)(cp => writer.option("checkpointLocation", cp))
      .start()
  }

  /** [[pollToTracking]]'s MERGE-shaped sibling (VERDICT r7 #6): instead
    * of appending to the change log and compacting on read, each
    * micro-batch of refreshed job states upserts directly into the
    * compacted state table via [[graft.operators.Tracking.upsert]] —
    * the foreachBatch MERGE-equivalent. Upsert is idempotent per batch
    * (equal-timestamp updates win ties deterministically), so the
    * replayed micro-batch after a crash re-applies harmlessly.
    */
  def pollToState(events: Dataset[StatusEvent], statePath: String,
                  trigger: Trigger = Trigger.ProcessingTime("300 seconds"),
                  checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = trackJobs(events).writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[JobState], _: Long) =>
        graft.operators.Tracking.upsert(toTrackingRecords(batch), statePath)
      }
    checkpointDir.fold(writer)(cp => writer.option("checkpointLocation", cp))
      .start()
  }
}
