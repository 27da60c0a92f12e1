package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Schemas

/** The job-tracking table (SURVEY.md §2.1 S9/S10) — the reference keeps an
  * append-only CSV it also rewrites in place for keyed status updates
  * (append auto_translate.py:134-156; read-modify-write by job_id at
  * 159-205, duplicated in batch_auto_translate.py:18-66).
  *
  * Spark-native design: an append-only CHANGE LOG plus a compaction view.
  * Appends are cheap distributed writes (S9); a keyed update is just an
  * appended partial record (null = "keep previous value"), and the current
  * table is `latestState` — per job_id, the last non-null value of every
  * column (S10). This is MERGE/upsert semantics without a table format
  * dependency, and it scales: one shuffle on job_id, no driver-side
  * read-modify-write of the whole table.
  */
object Tracking {

  private val cols = Schemas.tracking.fieldNames.toSeq

  /** S9 — append records to the tracking log (creates the directory on
    * first use; header carried per part file).
    */
  def append(records: DataFrame, path: String): Unit =
    records
      .select(cols.map(col): _*)
      .write.mode("append").option("header", "true").csv(path)

  /** Read the raw change log. */
  def readLog(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.tracking).option("header", "true").csv(path)

  /** S10 — keyed update as an appended partial record: only job_id, the
    * new status, optionally output_file, and the update timestamp are set;
    * null columns mean "unchanged" (matches the in-place column update of
    * auto_translate.py:180-192).
    */
  def statusUpdate(spark: SparkSession, jobId: String, status: String,
                   timestamp: Long, outputFile: Option[String] = None): DataFrame = {
    import spark.implicits._
    Seq((jobId, status, timestamp, outputFile.orNull))
      .toDF("job_id", "status", "timestamp", "output_file")
      .select(
        lit(null).cast("string").as("batch_id"),
        lit(null).cast("string").as("input_file"),
        col("job_id"), col("status"), col("timestamp"),
        lit(null).cast("string").as("target_language"),
        col("output_file"))
  }

  /** The compacted current-state table: one row per job_id where every
    * column holds its last non-null value in `seq` order (seq must be
    * unique per job_id — e.g. the update timestamp plus a tiebreak).
    * One shuffle on job_id; the window frame is unbounded so each column
    * resolves in the same pass.
    */
  def latestState(log: DataFrame, seq: Column): DataFrame = {
    val w = Window.partitionBy("job_id").orderBy(seq)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val resolved = cols.filterNot(_ == "job_id").map { c =>
      last(col(c), ignoreNulls = true).over(w).as(c)
    }
    val rn = row_number().over(Window.partitionBy("job_id").orderBy(seq.desc))
    log
      .select((col("job_id") +: resolved) :+ rn.as("_rn"): _*)
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** P4 — status filter over the compacted view (batch_tracker.py:66-80). */
  def withStatus(state: DataFrame, status: String): DataFrame =
    state.filter(col("status") === status)
}
