package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The FEEDS of [[ManifestTable]] — append-only and full-CDC change
  * consumption (batch faces; [[ManifestStreamSource]] drives the same
  * walk per micro-batch). Mixed into `object ManifestTable`; see
  * [[ManifestRowOps]] for the module-boundary contract.
  */
private[ext] trait ManifestFeeds { this: ManifestTable.type =>

  // ---------------------------------------------- change feed

  /** The APPEND-ONLY CHANGE FEED: all rows added by `append` commits in
    * versions `(fromVersion, toVersion]`, each tagged with the
    * `commit_version` that added it — the incremental-consumption
    * contract a downstream pipeline needs to process a table's new data
    * without rescanning it. Commit-kind provenance makes the feed
    * honest:
    *
    *   - `compact` commits contribute NOTHING (their files are pure
    *     rewrites of rows an earlier version already surfaced);
    *   - `delete` / `update` / `merge` commits RAISE — their rewrites
    *     remove or change rows, which an append-only feed cannot
    *     represent; a consumer that silently skipped them would drift
    *     from the table (the CDC-file design real formats bolt on for
    *     this is out of scope, and quietly wrong is worse than loud);
    *   - manifests written before op tracking RAISE for the same reason.
    *
    * Rows are read with `toVersion`'s recorded schema, so the feed is
    * union-compatible across schema evolution (early appends null-fill
    * columns added later). Historical data files must still be on disk —
    * the same [[vacuum]] grace-window contract as time travel.
    */
  /** (version, files that version's APPEND commit added) for versions in
    * `(fromVersion, toVersion]` — the shared walk behind the batch feed
    * and the streaming source. Compactions contribute nothing; row-level
    * commits and pre-provenance manifests raise (see [[appendsBetween]]).
    */
  /** One version's change summary for the feeds: its op kind, the files
    * it ADDED and REMOVED, whether it stacked new deletion vectors, and
    * its CDC sidecar. For a delta-logged version this is the delta file
    * itself — O(change) bytes, no snapshot resolution at all; a
    * checkpoint-only version (pre-incremental table) falls back to
    * diffing consecutive snapshots, exactly the old walk.
    */
  private final case class VersionChange(v: Long, op: String,
                                         adds: Seq[String],
                                         removedOrDvd: Boolean,
                                         cdcPath: Option[String],
                                         sizes: Map[String, Long]) {
    /** PROOF the commit's added files hold only NEW rows: nothing was
      * removed and no deletion vector landed, so every previously
      * visible row is still visible through its original file — the
      * adds can only be inserts, whatever the op label says. This is
      * what lets a pure-insert `merge` (op "merge", zero candidates
      * touched) ride the append-only feed, and lets a zero-match
      * delete/update (op recorded for idempotence, no delta at all)
      * contribute nothing instead of poisoning the feed.
      */
    def pureInsert: Boolean = !removedOrDvd
  }

  /** One version's change record — delta fast path when the log still
    * holds the file, checkpoint snapshot diff otherwise. The ONE place
    * "what did version v change" is computed; the feed classification
    * and the admission walk both read it, so they can never diverge.
    */
  private def versionChangeAt(spark: SparkSession, dir: String,
                              log: LogFiles, v: Long): VersionChange =
    if (log.delta.contains(v)) {
      val d = readDelta(spark, dir, v)
      // dvClear counts as a row-visibility change: a restore whose only
      // action RESETS surviving files' deletion vectors (cleardv: with
      // no removes and no new dv: suffix) resurrects rows — a feed that
      // classified it pureInsert would silently skip the commit and
      // drift from the table
      VersionChange(v, d.op, d.adds,
        d.removes.nonEmpty || d.dvs.nonEmpty || d.dvClear.nonEmpty,
        d.cdcPath, d.sizes)
    } else {
      val cur = resolveAt(spark, dir, v, log)
      val prev = resolveAt(spark, dir, v - 1L, log)
      val prevSet = prev.files.toSet
      val curSet = cur.files.toSet
      // ANY dv-ref difference — growth, shrinkage, or rewrite — means
      // visible rows changed (shrinkage is the restore shape the
      // growth-only check used to miss)
      val dvChanged = (cur.dvs.keySet ++ prev.dvs.keySet).exists { fn =>
        cur.dvs.getOrElse(fn, Seq.empty) != prev.dvs.getOrElse(fn, Seq.empty)
      }
      VersionChange(v, cur.op, cur.files.filterNot(prevSet),
        prev.files.exists(!curSet.contains(_)) || dvChanged, cur.cdcPath,
        cur.sizes)
    }

  private def versionChanges(spark: SparkSession, dir: String,
                             fromVersion: Long, toVersion: Long)
  : Seq[VersionChange] = {
    require(0 <= fromVersion && fromVersion <= toVersion,
      s"change walk needs 0 <= from <= to, got ($fromVersion, $toVersion)")
    val log = listLog(spark, dir)
    ((fromVersion + 1L) to toVersion).map(versionChangeAt(spark, dir, log, _))
  }

  /** The streaming source's ADMISSION WALK: per-version added data
    * files and their bytes over `(fromVersion, toVersion]`, lazily — a
    * rate-limited trigger stops reading the log the moment its cap is
    * reached, so a whole backfill costs O(total versions) small log
    * reads ACROSS all its triggers, never per trigger. Bytes come from
    * each commit's own `size:` lines (exact at write time; a version
    * only reachable through a checkpoint falls back to the snapshot
    * diff). No feed classification here — a commit the append feed
    * cannot represent fails in `getBatch` wherever the cut lands.
    */
  private[graft] def addedSizesIterator(spark: SparkSession, dir: String,
                                        fromVersion: Long, toVersion: Long)
  : Iterator[(Long, Int, Long)] = {
    val log = listLog(spark, dir)
    ((fromVersion + 1L) to toVersion).iterator.map { v =>
      val c = versionChangeAt(spark, dir, log, v)
      (v, c.adds.size, c.adds.map(a => c.sizes.getOrElse(a, 0L)).sum)
    }
  }

  /** Feed classification is by ACTUAL DELTA CONTENT, not op label:
    *
    *   - `compact` / `metadata` commits are known row-preserving
    *     (rewrites / no data at all) — skipped;
    *   - a commit that removed nothing and stacked no deletion vector
    *     provably added only new rows ([[VersionChange.pureInsert]]) —
    *     surfaced as inserts regardless of label ("append", a
    *     pure-insert "merge", even a pre-provenance manifest whose
    *     add-only diff is its own proof);
    *   - anything that removed files or landed a DV changed visible
    *     rows — the append feed raises (it cannot represent removal).
    */
  /** `skipChanges` (the streaming source's `skipChangeCommits` option,
    * Delta's spelling): a commit that removed or DV-marked files
    * contributes NOTHING instead of failing the feed — the caller has
    * explicitly chosen an appends-only view that diverges from the
    * table across row-level commits (their rewritten files, updated
    * and untouched rows alike, are never re-emitted). The default
    * stays the honest raise.
    */
  private[graft] def appendCommitsBetween(spark: SparkSession, dir: String,
                                          fromVersion: Long, toVersion: Long,
                                          skipChanges: Boolean = false)
  : Seq[(Long, Seq[String])] =
    versionChanges(spark, dir, fromVersion, toVersion).flatMap { c =>
      c.op match {
        case "compact" | "metadata" => None // rewrites: no rows changed
        case _ if c.pureInsert =>
          if (c.adds.isEmpty) None else Some((c.v, c.adds))
        case _ if skipChanges => None // opted-in divergence, whole commit
        case "" => throw new IllegalStateException(
          s"append feed: version ${c.v} of $dir removed or DV-marked " +
            "files and has no op provenance (manifest written before op " +
            "tracking) — cannot prove its changes are appends")
        case other => throw new IllegalStateException(
          s"append feed: version ${c.v} of $dir is a row-level '$other' " +
            "commit that removed or changed visible rows; an append-only " +
            "feed cannot represent it (stream with skipChangeCommits = " +
            "true to skip such commits, or consume readChangeFeed)")
      }
    }

  /** One contributing version's change record for the CDC feeds. */
  private[graft] sealed trait FeedPart
  /** The commit provably added only new rows — the files ARE the
    * changes, all inserts.
    */
  private[graft] final case class FeedInserts(files: Seq[String])
      extends FeedPart
  /** The commit recorded a CDC sidecar — the authoritative record. */
  private[graft] final case class FeedSidecar(name: String) extends FeedPart
  /** A RESTORE commit: its changes are the SNAPSHOT DIFF, synthesized
    * at read time by [[restoreDiffFrame]] (deletes for rows the rewind
    * removed, inserts for rows it resurrected).
    */
  private[graft] case object FeedRestoreDiff extends FeedPart

  /** The CDC walk over `(fromVersion, toVersion]`: per contributing
    * version, a [[FeedSidecar]] when the commit recorded one (the
    * authoritative change record), a [[FeedInserts]] when the commit
    * provably added only new rows ([[VersionChange.pureInsert]]), or a
    * [[FeedRestoreDiff]] for a restore commit (VERDICT r13 order #4:
    * the feed SPANS a rewind instead of raising — consumers survive an
    * upstream restore). Compactions are skipped; any other commit that
    * removed or DV-marked rows without a sidecar raises (see
    * [[changesBetween]]).
    */
  private[graft] def changeCommitsBetween(spark: SparkSession, dir: String,
                                          fromVersion: Long, toVersion: Long)
  : Seq[(Long, FeedPart)] =
    versionChanges(spark, dir, fromVersion, toVersion).flatMap { c =>
      c.op match {
        case "compact" | "metadata" => None // no rows changed
        case _ => c.cdcPath match {
          case Some(name) => Some((c.v, FeedSidecar(name)))
          case None if c.pureInsert =>
            if (c.adds.isEmpty) None else Some((c.v, FeedInserts(c.adds)))
          // a REPLACE is, to the feed, the same shape as a restore: the
          // snapshot diff (deletes of the old contents, inserts of the
          // new) IS its exact change record — synthesized the same way
          case None if c.op == "restore" || c.op == "replace" =>
            Some((c.v, FeedRestoreDiff))
          case None => throw new IllegalStateException(
            s"change feed: version ${c.v} of $dir is a " +
              s"'${if (c.op.isEmpty) "unknown" else c.op}' commit that " +
              "removed or changed visible rows without a CDC sidecar " +
              "(the op ran with cdc = false) — its changes cannot be " +
              "reconstructed")
        }
      }
    }

  /** Columns the FEEDS add to every row they surface. A table column of
    * the same name would be silently overwritten (`withColumn`
    * replaces), corrupting the feed — the feed entry points raise
    * instead. Appends themselves stay unrestricted: a table never
    * consumed as a feed may call its columns whatever it likes.
    */
  private[graft] def requireNoReservedFeedCols(
      sc: org.apache.spark.sql.types.StructType, reserved: Seq[String],
      what: String): Unit = {
    val hit = sc.fields.map(_.name)
      .filter(n => reserved.exists(_.equalsIgnoreCase(n)))
    require(hit.isEmpty,
      s"$what reserves column name(s) ${hit.mkString(", ")}, which this " +
        "table already has — the feed would silently overwrite their " +
        "values; rename the column(s) or consume the table level instead")
  }

  def appendsBetween(spark: SparkSession, dir: String,
                     fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val to = snapshotAt(spark, dir, toVersion)
    val added = appendCommitsBetween(spark, dir, fromVersion, toVersion)
    val schema = tableSchema(to)
    schema.foreach(requireNoReservedFeedCols(_, Seq("commit_version"),
      "the append feed"))
    if (added.isEmpty) {
      val sc = schema.getOrElse {
        require(to.files.nonEmpty,
          s"appendsBetween: no appends in range and no schema at $dir")
        readFiles(spark, dir, to, to.files).schema
      }
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        sc.add("commit_version", org.apache.spark.sql.types.LongType))
    } else added.map { case (v, names) =>
      val base = toLogical(to,
        schema.fold(spark.read)(sc => spark.read.schema(physSchema(to, sc)))
          .parquet(names.map(n => ManifestTable.dataFilePath(dir, n)): _*))
      // legacy tables (no tracked schema) surface their columns from the
      // footers — the reservation must hold for those too
      requireNoReservedFeedCols(base.schema, Seq("commit_version"),
        "the append feed")
      base.withColumn("commit_version", lit(v))
    }.reduce(_ unionByName _)
  }

  /** The FULL CHANGE DATA FEED over versions `(fromVersion, toVersion]`:
    * every row-level change, typed by `_change_type` and tagged with the
    * `commit_version` that made it —
    *
    *   - `append` commits yield their rows as `insert` (read straight
    *     from the data files, no sidecar needed — the files ARE the
    *     changes);
    *   - `compact` commits yield nothing (pure rewrites);
    *   - `delete` / `update` / `merge` commits yield their CDC sidecar:
    *     `delete`, `update_preimage`/`update_postimage`, `insert` — IF
    *     the op ran with `cdc = true`. A row-level commit WITHOUT a
    *     sidecar raises: the feed will not silently skip changes it
    *     cannot see (re-run such ops with CDC on, or consume the table
    *     level instead);
    *   - `restore` commits yield their SYNTHESIZED snapshot diff
    *     ([[restoreDiffFrame]]): `delete` for rows the rewind removed,
    *     `insert` for rows it resurrected — the feed spans an upstream
    *     restore instead of stranding its consumers.
    *
    * Rows are read with `toVersion`'s schema (union-compatible across
    * schema evolution). This is what turns the table into a replicable
    * log: a downstream consumer applying the feed in commit order
    * reconstructs every intermediate state exactly.
    */
  def changesBetween(spark: SparkSession, dir: String,
                     fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(0 <= fromVersion && fromVersion <= toVersion,
      s"changesBetween needs 0 <= from <= to, got ($fromVersion, $toVersion)")
    val to = snapshotAt(spark, dir, toVersion)
    val baseSchema = tableSchema(to).getOrElse {
      require(to.files.nonEmpty,
        s"changesBetween: no schema and no files at $dir v$toVersion")
      readFiles(spark, dir, to, to.files).schema
    }
    requireNoReservedFeedCols(baseSchema,
      Seq("_change_type", "commit_version"), "the change data feed")
    val cdcSchema = baseSchema.add("_change_type",
      org.apache.spark.sql.types.StringType)
    val parts = changeCommitsBetween(spark, dir, fromVersion, toVersion)
      .map {
        case (v, FeedInserts(fresh)) =>
          toLogical(to, spark.read.schema(physSchema(to, baseSchema))
            .parquet(fresh.map(n => ManifestTable.dataFilePath(dir, n)): _*))
            .withColumn("_change_type", lit("insert"))
            .withColumn("commit_version", lit(v))
        case (v, FeedSidecar(name)) =>
          // sidecars are written PHYSICAL (like data files), so renames
          // never invalidate recorded history; surfaced under
          // `toVersion`'s logical names like every other feed row
          toLogical(to, spark.read
            .schema(physSchema(to, baseSchema).add("_change_type",
              org.apache.spark.sql.types.StringType))
            .parquet(s"${cdcDir(dir)}/$name"))
            .withColumn("commit_version", lit(v))
        case (v, FeedRestoreDiff) =>
          restoreDiffFrame(spark, dir, v, baseSchema, to)
            .withColumn("commit_version", lit(v))
      }
    if (parts.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        cdcSchema.add("commit_version", org.apache.spark.sql.types.LongType))
    else parts.reduce(_ unionByName _)
  }

  /** A RESTORE commit's change record, SYNTHESIZED as the diff between
    * the snapshots it moved between (a restore writes no sidecar —
    * nothing ran row-level). O(changed files + changed DV positions),
    * never O(table):
    *
    *   - files the rewind REMOVED contribute their then-visible rows
    *     (pre-restore DVs applied) as `delete`;
    *   - files it RESURRECTED contribute their now-visible rows
    *     (post-restore DVs applied) as `insert`;
    *   - files surviving with CHANGED deletion vectors contribute only
    *     the positions that flipped: un-deleted positions as `insert`
    *     (the DV-only restore shape), newly-deleted ones as `delete`
    *     (restoring INTO a more-deleted version).
    *
    * Data files must still be on disk — the same [[vacuum]]
    * grace-window contract as time travel.
    */
  private[graft] def restoreDiffFrame(spark: SparkSession, dir: String,
                                      v: Long,
                                      baseSchema: org.apache.spark.sql.types.StructType,
                                      mapSnap: Snapshot)
  : DataFrame = {
    import org.apache.spark.sql.functions.{col, element_at, lit, split}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val cur = snapshotAt(spark, dir, v)
    val prev = snapshotAt(spark, dir, v - 1L)
    val curSet = cur.files.toSet
    val prevSet = prev.files.toSet
    val fm = "_graft_meta_file"
    val pm = "_graft_meta_pos"

    def withPos(names: Seq[String]): DataFrame =
      // mapSnap is the snapshot `baseSchema`'s logical names came from
      // (the feed's end version / the stream's start) — physical names
      // are stable, so it maps every era's files correctly
      toLogical(mapSnap, spark.read.schema(physSchema(mapSnap, baseSchema))
        .parquet(names.map(n => ManifestTable.dataFilePath(dir, n)): _*)
        .withColumn(fm, element_at(split(col("_metadata.file_path"), "/"), -1))
        .withColumn(pm, col("_metadata.row_index")))

    // the (file, position) pairs snapshot `s` marks deleted in `names`
    def delPos(s: Snapshot, names: Seq[String]): DataFrame = {
      val refs = names.flatMap(n => s.dvs.getOrElse(n, Seq.empty))
        .map(_.name).distinct
      if (refs.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(DvFileCol, StringType),
          StructField(DvPosCol, LongType))))
      else spark.read.parquet(refs.map(n => s"${dvDir(dir)}/$n"): _*)
        .select(col(DvFileCol), col(DvPosCol))
        .where(col(DvFileCol).isin(names: _*))
    }

    def visible(s: Snapshot, names: Seq[String]): DataFrame = {
      val base = withPos(names)
      val dels = delPos(s, names)
      base.join(dels,
        base(fm) === dels(DvFileCol) && base(pm) === dels(DvPosCol),
        "left_anti").drop(fm, pm)
    }

    val baseCols = baseSchema.fieldNames.toSeq.map(col)
    val buf = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val removed = prev.files.filterNot(curSet)
    if (removed.nonEmpty)
      buf += visible(prev, removed).select(baseCols: _*)
        .withColumn("_change_type", lit("delete"))
    val added = cur.files.filterNot(prevSet)
    if (added.nonEmpty)
      buf += visible(cur, added).select(baseCols: _*)
        .withColumn("_change_type", lit("insert"))
    val dvChanged = prev.files.filter(n => curSet.contains(n) &&
      prev.dvs.getOrElse(n, Seq.empty) != cur.dvs.getOrElse(n, Seq.empty))
    if (dvChanged.nonEmpty) {
      val base = withPos(dvChanged)
      val before = delPos(prev, dvChanged)
      val after = delPos(cur, dvChanged)
      val resurrected = before.except(after) // deleted then, visible now
      val redeleted = after.except(before)   // visible then, deleted now
      buf += base.join(resurrected,
        base(fm) === resurrected(DvFileCol) &&
          base(pm) === resurrected(DvPosCol), "left_semi")
        .select(baseCols: _*).withColumn("_change_type", lit("insert"))
      buf += base.join(redeleted,
        base(fm) === redeleted(DvFileCol) &&
          base(pm) === redeleted(DvPosCol), "left_semi")
        .select(baseCols: _*).withColumn("_change_type", lit("delete"))
    }
    if (buf.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      baseSchema.add("_change_type", org.apache.spark.sql.types.StringType))
    else buf.reduce(_ unionByName _)
  }

}
