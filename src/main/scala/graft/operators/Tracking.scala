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

  // ------------------------------------------------ incremental upsert

  /** S10 as an INCREMENTAL MERGE-equivalent (SURVEY §1.1 row 6 names
    * Delta-style MERGE as the idiomatic target; this is the same
    * semantics without a table-format dependency): fold one batch of
    * (possibly partial, null = "unchanged") tracking records into a
    * compacted parquet state table at `statePath/current`, one row per
    * job_id.
    *
    * Semantics: identical to [[latestState]] over the full change log —
    * the state table is the fold's accumulator, so each upsert touches
    * state-size + batch-size rows instead of recompacting an ever-growing
    * log. Ordering inside the fold is (timestamp, is-update): at equal
    * timestamps the incoming record wins over the accumulated row, which
    * makes RE-applying a batch a no-op — exactly the idempotence a
    * foreachBatch sink needs, since Structured Streaming replays the last
    * uncommitted micro-batch after a crash. Like MERGE, each batch
    * resolves against the CURRENT state row, not the full history: with
    * batches arriving in non-decreasing timestamp order (a streaming
    * sink's arrival order) the result is identical to [[latestState]]
    * over the whole log; an out-of-order batch loses to the newer
    * accumulated row, which is what an upsert should do. Updates must
    * carry a non-null timestamp.
    *
    * Durability: the new state is fully written to a stage directory
    * before a rename swap (stage → current), so readers never see a
    * half-written table; the swap itself is two renames, not one atomic
    * commit — a production deployment on object storage would put a real
    * table format (Delta/Iceberg) under this same foreachBatch seam.
    */
  def upsert(updates: DataFrame, statePath: String): Unit = {
    val spark = updates.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(statePath), spark.sparkContext.hadoopConfiguration)
    val cur = new org.apache.hadoop.fs.Path(s"$statePath/current")
    val stage = new org.apache.hadoop.fs.Path(s"$statePath/_stage")
    val old = new org.apache.hadoop.fs.Path(s"$statePath/_old")
    val existing =
      if (fs.exists(cur)) spark.read.parquet(cur.toString)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.tracking)
    val merged = latestState(
      existing.withColumn("_upd", lit(0))
        .unionByName(updates.select(cols.map(col): _*).withColumn("_upd", lit(1))),
      struct(col("timestamp"), col("_upd")))
    fs.delete(stage, true)
    merged.write.parquet(stage.toString)
    fs.delete(old, true)
    if (fs.exists(cur)) fs.rename(cur, old)
    fs.rename(stage, cur)
    fs.delete(old, true)
  }

  /** The compacted state table maintained by [[upsert]]. */
  def readState(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(s"$statePath/current")
}
