package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** The MANIFEST TABLE AS A STREAM — Structured Streaming's incremental
  * consumption of a committed table, the Delta streaming-source design
  * reduced to its essentials:
  *
  *   - OFFSETS ARE MANIFEST VERSIONS. The committed version number is
  *     exactly the durable, totally-ordered progress marker a streaming
  *     offset needs; `getOffset` is one manifest resolution (a directory
  *     listing + one small file read), no data I/O.
  *   - A BATCH IS THE APPEND FEED between two versions: the files that
  *     `append` commits added in `(start, end]`, via the same
  *     op-provenance walk as [[ManifestTable.appendsBetween]].
  *     Compactions contribute nothing (pure rewrites); a row-level
  *     commit (delete/update/merge) FAILS the stream rather than
  *     silently drifting from the table — the same honest contract as
  *     the batch feed, and what Delta does without ignoreChanges.
  *     `skipChangeCommits = true` (Delta's spelling) opts into
  *     skipping such commits whole — an appends-only view that
  *     knowingly diverges; the honest raise stays the default.
  *   - `cdcMode` switches the batch to the FULL CHANGE FEED (the
  *     streaming face of [[ManifestTable.changesBetween]]): appends
  *     arrive as `insert` rows, row-level commits as their typed CDC
  *     sidecars (`delete`, `update_preimage`/`update_postimage`,
  *     `insert`), each tagged `commit_version` — so even a table under
  *     deletes and upserts is consumable as a stream; a sidecar-less
  *     row-level commit still fails the stream.
  *   - EXACTLY-ONCE follows from the two sides' idempotence: versions
  *     replay deterministically (manifests are immutable), and the sink
  *     dedups by batch id as usual. A restart re-reads `(lastCommitted,
  *     head]` — no rows lost, none doubled.
  *
  * Each batch is a normal parquet relation over exactly the batch's
  * files (vectorized scan, pushdown intact), marked `isStreaming` as the
  * V1 source contract requires. At 100 TB the per-trigger driver cost is
  * O(appended files) — the table's size never enters the loop.
  */
class ManifestStreamSource(spark: SparkSession, dir: String,
                           baseSchema: StructType,
                           sinceVersion: Long,
                           cdcMode: Boolean = false,
                           maxVersionsPerTrigger: Option[Long] = None,
                           maxFilesPerTrigger: Option[Int] = None,
                           maxBytesPerTrigger: Option[Long] = None,
                           skipChangeCommits: Boolean = false)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  // Rate limiting: without a cap, a stream started on a year-old table
  // reads its ENTIRE history as one micro-batch. `maxVersionsPerTrigger`
  // bounds each batch to that many manifest versions past the last batch
  // end this source has seen (`getBatch` keeps it current, including the
  // engine's restart-recovery call, so a restarted query resumes capping
  // from its committed offset, not from sinceVersion).
  @volatile private var lastSeen: Long = sinceVersion

  // `Trigger.AvailableNow`: the engine announces the bounded-backfill
  // contract before the first trigger; the head frozen HERE is the
  // stream's whole world — later commits wait for the next run. With
  // `maxVersionsPerTrigger` the backfill drains in fixed version
  // windows, then the query STOPS (latestOffset returns null at the
  // frozen head, the engine sees no more data).
  @volatile private var frozenHead: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    frozenHead = Some(ManifestTable.headVersion(spark, dir))

  override def getDefaultReadLimit
  : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  /** The admission-control face (the engine prefers it over `getOffset`
    * whenever the source declares it): next batch end = committed
    * offset + at most `maxVersionsPerTrigger` versions, cut further by
    * `maxFilesPerTrigger` / `maxBytesPerTrigger` (the Delta rate-limit
    * idiom — added data files / their bytes per micro-batch, measured
    * from the commits' own size lines, ALWAYS admitting at least one
    * version because a commit is atomic), never past the
    * AvailableNow-frozen head. Returns null when drained — under
    * `Trigger.AvailableNow` that is the clean stop. The admission walk
    * is lazy, so a backfill's total log-read cost is O(versions) across
    * all its triggers.
    */
  override def latestOffset(
      startOffset: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
  : org.apache.spark.sql.connector.read.streaming.Offset = {
    val base = math.max(sinceVersion,
      Option(startOffset).map(verOf).getOrElse(sinceVersion))
    val head = frozenHead.getOrElse(ManifestTable.headVersion(spark, dir))
    val vCap = maxVersionsPerTrigger.fold(head)(m =>
      math.min(head, base + m))
    val cut =
      if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty) vCap
      else {
        var files = 0L; var bytes = 0L; var last = base
        val it = ManifestTable.addedSizesIterator(spark, dir, base, vCap)
        var stop = false
        while (!stop && it.hasNext) {
          val (v, nf, nb) = it.next()
          val wf = files + nf
          val wb = bytes + nb
          if (last > base && (maxFilesPerTrigger.exists(wf > _) ||
              maxBytesPerTrigger.exists(wb > _))) stop = true
          else { files = wf; bytes = wb; last = v }
        }
        last
      }
    if (cut <= base) null else LongOffset(cut)
  }

  override def reportLatestOffset()
  : org.apache.spark.sql.connector.read.streaming.Offset =
    LongOffset(ManifestTable.headVersion(spark, dir))

  private def verOf(
      o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o match {
      case LongOffset(v) => v
      case other => other.json.trim.toLong
    }

  // the CDC stream adds these two columns to every row — a table column
  // of the same name would be silently overwritten; fail at source
  // construction, not deep inside a running query
  if (cdcMode) ManifestTable.requireNoReservedFeedCols(baseSchema,
    Seq("_change_type", "commit_version"), "the streaming change feed")

  // COLUMN MAPPING, captured once with `baseSchema`: a streaming schema
  // is fixed at start, and physical parquet names never change, so this
  // start-time mapping reads every batch's files correctly even across
  // a mid-stream RENAME (rows keep surfacing under the start names); a
  // mid-stream DROP null-fills from then on, like any absent column
  private val startSnap = ManifestTable.snapshot(spark, dir)

  override val schema: StructType =
    if (!cdcMode) baseSchema
    else baseSchema.add("_change_type", StringType)
      .add("commit_version", LongType)

  override def getOffset: Option[Offset] = {
    // headVersion is ONE _manifest/ listing, zero parse — the per-trigger
    // idle cost of a stream on a quiet table is O(log files), never
    // O(table files)
    val head = ManifestTable.headVersion(spark, dir)
    if (head <= sinceVersion) None
    else Some(LongOffset(
      maxVersionsPerTrigger.fold(head)(m =>
        math.min(head, math.max(lastSeen, sinceVersion) + m))))
  }

  // a restarted query hands back SerializedOffset(json) — parse either
  // (the V1 Offset is a connector Offset, one decoder serves both faces)
  private def ver(o: Offset): Long = verOf(o)

  /** A streaming parquet relation over an explicit file list — bound
    * physical, surfaced logical (see `startSnap`).
    */
  private def rel(paths: Seq[Path], sc: StructType): DataFrame =
    ManifestTable.toLogical(startSnap,
      org.apache.spark.sql.graft.GraftSqlShims.ofRows(spark,
        LogicalRelation(
          HadoopFsRelation(new StaticFileIndex(spark, paths),
            partitionSchema = StructType(Nil),
            dataSchema = ManifestTable.physSchema(startSnap, sc),
            bucketSpec = None, fileFormat = new ParquetFileFormat,
            options = Map.empty)(spark),
          isStreaming = true)))

  private def dataPaths(names: Seq[String]): Seq[Path] =
    names.map(n => new Path(s"$dir/data/$n"))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.fold(sinceVersion)(ver)
    val to = ver(end)
    lastSeen = math.max(lastSeen, to)
    if (!cdcMode) {
      val names = ManifestTable.appendCommitsBetween(spark, dir, from, to,
          skipChanges = skipChangeCommits)
        .flatMap(_._2)
      // restrict the batch's file index to exactly the appended files;
      // the snapshot's stats ride along, so pushed filters prune WITHIN
      // the batch too (a filtered stream never opens files its predicate
      // excludes)
      // dvs restricted to the batch's own files (provably none: a
      // dv-delete inside the range fails the append walk, and one after
      // `to` is not visible at `to`) — table-wide DVs on OTHER files
      // must not trip the index's no-DV guard
      val snap0 = ManifestTable.snapshotAt(spark, dir, to)
      val snap = snap0.copy(files = names,
        dvs = snap0.dvs.view.filterKeys(names.toSet).toMap)
      ManifestTable.toLogical(startSnap,
        org.apache.spark.sql.graft.GraftSqlShims.ofRows(spark,
          LogicalRelation(
            HadoopFsRelation(new ManifestFileIndex(spark, dir, snap),
              partitionSchema = StructType(Nil),
              dataSchema = ManifestTable.physSchema(startSnap, baseSchema),
              bucketSpec = None, fileFormat = new ParquetFileFormat,
              options = Map.empty)(spark),
            isStreaming = true)))
    } else {
      val cdcSchema = baseSchema.add("_change_type", StringType)
      val parts = ManifestTable.changeCommitsBetween(spark, dir, from, to)
        .map {
          case (v, ManifestTable.FeedInserts(appended)) =>
            rel(dataPaths(appended), baseSchema)
              .withColumn("_change_type", lit("insert"))
              .withColumn("commit_version", lit(v))
          case (v, ManifestTable.FeedSidecar(sidecarDir)) =>
            val conf = spark.sparkContext.hadoopConfiguration
            val d = new Path(s"$dir/_cdc/$sidecarDir")
            val files = d.getFileSystem(conf).listStatus(d)
              .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
              .map(_.getPath).toSeq
            rel(files, cdcSchema).withColumn("commit_version", lit(v))
          case (v, ManifestTable.FeedRestoreDiff) =>
            // the synthesized snapshot diff is a join-built plan, not a
            // file list — re-mark its batch plan as this micro-batch's
            // streaming frame (rows identical, flag only)
            org.apache.spark.sql.graft.GraftSqlShims.asStream(
              ManifestTable.restoreDiffFrame(spark, dir, v, baseSchema,
                startSnap))
              .withColumn("commit_version", lit(v))
        }
      if (parts.isEmpty) rel(Seq.empty, cdcSchema)
        .withColumn("commit_version", lit(0L))
      else parts.reduce(_ unionByName _)
    }
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"ManifestStreamSource[$dir${if (cdcMode) ", cdc" else ""}]"
}
