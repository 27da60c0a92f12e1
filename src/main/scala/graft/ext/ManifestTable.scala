package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import scala.annotation.tailrec

/** A minimal manifest-committed parquet table — the missing ATOMIC
  * COMMIT under the repo's append-only sinks, built from the two
  * primitives every real table format (Delta, Iceberg) reduces to:
  * data files are immutable and written OUT OF VIEW, and a single
  * versioned manifest file names the table's exact current contents.
  *
  * Why this exists: plain-directory sinks ([[Compact]], the
  * [[graft.streaming.Ingest]] corpus) are honest about their windows —
  * at-least-once appends after a crash, transiently-duplicated rows
  * during compaction, readers racing writers. All three disappear when
  * visibility is a manifest swap instead of a directory listing:
  *
  *   - APPEND: data files land under `data/` with UUID names (invisible
  *     — readers only trust the manifest), then one new manifest version
  *     references them. Crash before the commit = orphan files, not
  *     duplicate rows; [[vacuum]] sweeps orphans later.
  *   - IDEMPOTENCE: each commit records its `batchId`; re-appending an
  *     absorbed batch is a no-op, so a crash-REPLAYED micro-batch
  *     cannot double its rows — effectively-once, not at-least-once.
  *   - COMPACT: rewritten files commit in ONE manifest swap that drops
  *     the originals in the same version. A concurrent reader resolves
  *     either the old snapshot or the new one, never a mix, never a
  *     duplicate — the atomicity [[Compact]] documents as impossible
  *     for bare directories.
  *   - ISOLATION: a reader pins the manifest version it resolved;
  *     every file it reads is immutable, so its snapshot cannot change
  *     underneath the query.
  *
  * Concurrency control is optimistic CAS on the manifest name: version
  * N+1 is staged to a temp name and published as `v<N+1>` with an
  * atomic create-if-absent — a hard link on local filesystems (POSIX
  * rename(2) would silently replace, losing a racing commit), a rename
  * on HDFS-semantics filesystems (which refuse a rename onto an
  * existing path) — so exactly one of two racing committers wins and
  * the loser re-reads and retries. (On object stores with neither
  * primitive this needs a lock service — the same deployment caveat
  * Delta documents.)
  *
  * Scale: the manifest holds one line per live data file plus one per
  * absorbed batch id — kilobytes for thousands of files; resolution is
  * one `_last_checkpoint` pointer read + O(since-checkpoint) probes
  * (no directory listing), the data read is an explicit file list (no
  * recursive directory scan), and [[expireLog]] bounds the log
  * directory itself.
  */
object ManifestTable extends ManifestRowOps with ManifestFeeds with ManifestMaintenance {

  private[ext] def fs(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private[ext] def p(s: String) = new org.apache.hadoop.fs.Path(s)

  /** Per-column min/max/null-count for ONE data file, harvested from the
    * parquet footer at commit time. `min`/`max` are canonical strings in
    * the column's comparison family (`long` for int32/int64/date/
    * timestamp, `double`, `string`, `bool`); None = the file has no
    * non-null value for the column. Columns whose footer stats are
    * absent, truncated, decimal/unsigned-typed, or NaN-polluted are
    * simply not listed — the reader then cannot prune on them, which is
    * the safe direction.
    */
  final case class ColStats(typ: String, min: Option[String],
                            max: Option[String], nulls: Long)

  /** Footer-derived stats for one data file: total row count plus
    * [[ColStats]] per usable column (keys lowercased — Spark resolves
    * attributes case-insensitively by default).
    */
  final case class FileStats(rows: Long, cols: Map[String, ColStats])

  /** One DELETION-VECTOR reference: a sidecar dataset under `_dv/<name>`
    * holding (file name, row position) pairs; `rows` = how many of the
    * referencing data file's positions it marks deleted (exact — the
    * positions are distinct by construction, and refs stacked on one
    * file mark disjoint positions because each new DV is computed on the
    * already-DV-applied read).
    */
  final case class DvRef(name: String, rows: Long)

  /** (version, data-file names, absorbed batch ids, per-file column
    * stats); version 0 = empty table before the first commit. `stats`
    * may cover only a subset of `files` — manifests written before stats
    * existed, or files whose footers could not be read, stay readable
    * and are never pruned.
    *
    * `op` names the KIND of commit that produced this version
    * ("append" | "compact" | "delete" | "update" | "merge"; "" on
    * manifests written before op tracking) — the provenance
    * [[appendsBetween]] needs to tell new rows from rewrites.
    *
    * `schemaJson` is the TABLE schema (Spark `StructType.json`) as of
    * this version — schema-on-manifest, the Delta/Iceberg design.
    * Without it, a multi-file parquet read takes the FIRST footer's
    * schema, so files appended later with extra columns silently lose
    * them; with it, every read projects the full column set and
    * null-fills files written before a column existed. None on tables
    * whose first commit predates schema tracking (they keep today's
    * footer-derived behavior).
    *
    * `sizes` records each data file's byte length, captured when the
    * file was moved into `data/` — what lets [[ManifestFileIndex]] build
    * `FileStatus` objects without LISTing the data directory (on object
    * stores a million-entry LIST per query is the throttled path) and
    * [[compact]] size its output without per-file RPCs. May cover a
    * subset of `files` on pre-sizes manifests (readers fall back to
    * listing).
    *
    * `dvs` maps a data file to its stacked deletion-vector references
    * (merge-on-read: the file's rows at those positions are deleted
    * without rewriting the file). `constraints` are the table's named
    * CHECK expressions, enforced at append/merge/update.
    */
  final case class Snapshot(version: Long, files: Seq[String],
                            batchIds: Set[String],
                            stats: Map[String, FileStats] = Map.empty,
                            op: String = "",
                            schemaJson: Option[String] = None,
                            cdcPath: Option[String] = None,
                            sizes: Map[String, Long] = Map.empty,
                            dvs: Map[String, Seq[DvRef]] = Map.empty,
                            constraints: Map[String, String] = Map.empty,
                            partitionCols: Seq[String] = Nil,
                            pvals: Map[String, Map[String, PartValue]] = Map.empty,
                            ndvCols: Seq[String] = Nil,
                            ndv: Map[String, Map[String, String]] = Map.empty,
                            properties: Map[String, String] = Map.empty,
                            colMap: Seq[(String, String)] = Nil,
                            retiredCols: Seq[String] = Nil)

  /** COLUMN MAPPING (`colMap`: logical name → physical parquet name;
    * `retiredCols`: physical names of dropped columns, never reusable):
    * the Delta/Iceberg design that makes RENAME and DROP COLUMN pure
    * metadata commits. Data files are immutable and carry the PHYSICAL
    * name a column had when written; a rename changes only the logical
    * name (physical stays, so every recorded stat, bloom sidecar, NDV
    * sketch and partition value keeps its key and keeps pruning); a
    * drop removes the logical column and retires its physical name so
    * a later re-ADD of the same name binds a FRESH physical slot
    * instead of resurrecting the dropped bytes. An empty `colMap` =
    * identity (tables never touched by rename/drop pay nothing); once
    * non-empty it lists EVERY current column, so a delta carrying any
    * `colmap:` line is a full redefinition and absence inherits.
    * Manifest-side invariant: `stats`/`ndv`/`pvals`/bloom sidecars and
    * the `ndvCols` declaration are keyed by PHYSICAL names; the
    * recorded `schemaJson` is LOGICAL.
    */
  private[graft] def physName(s: Snapshot, logical: String): String =
    if (s.colMap.isEmpty) logical
    else s.colMap.find(_._1.equalsIgnoreCase(logical)).map(_._2)
      .getOrElse(logical)

  /** True when some column's physical name differs from its logical one
    * — the only case read/write paths must translate.
    */
  private[graft] def mapped(s: Snapshot): Boolean =
    s.colMap.exists { case (l, p) => l != p }

  /** The PHYSICAL schema data files bind to: the logical schema with
    * every field renamed through the mapping.
    */
  private[graft] def physSchema(s: Snapshot,
                         logical: org.apache.spark.sql.types.StructType)
  : org.apache.spark.sql.types.StructType =
    if (!mapped(s)) logical
    else org.apache.spark.sql.types.StructType(
      logical.fields.map(f => f.copy(name = physName(s, f.name))))

  /** `df` (physical-named table columns, possibly plus graft-internal
    * meta columns) renamed to LOGICAL names; non-table columns pass
    * through untouched.
    */
  private[graft] def toLogical(s: Snapshot, df: DataFrame): DataFrame =
    if (!mapped(s)) df
    else {
      import org.apache.spark.sql.functions.col
      val inv = s.colMap.map { case (l, p) => (p.toLowerCase, l) }.toMap
      df.select(df.schema.fields.map { f =>
        inv.get(f.name.toLowerCase) match {
          case Some(l) if l != f.name => col(f.name).as(l)
          case _ => col(f.name)
        }
      }.toSeq: _*)
    }

  /** `df` (logical-named) renamed to PHYSICAL names for writing;
    * columns outside the mapping (a batch introducing a new column)
    * pass through under their own name.
    */
  private[graft] def toPhysical(s: Snapshot, df: DataFrame): DataFrame =
    if (!mapped(s)) df
    else {
      import org.apache.spark.sql.functions.col
      df.select(df.schema.fields.map { f =>
        val p = physName(s, f.name)
        if (p != f.name) col(f.name).as(p) else col(f.name)
      }.toSeq: _*)
    }

  /** A LOGICAL-named predicate expression translated to the physical
    * namespace the manifest's stats/blooms are keyed by — the seam the
    * SQL-string ops cross before probing [[Skipping]].
    */
  private[ext] def toPhysicalExpr(s: Snapshot,
                             e: org.apache.spark.sql.catalyst.expressions.Expression)
  : org.apache.spark.sql.catalyst.expressions.Expression =
    if (!mapped(s)) e
    else e.transformUp {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.nameParts.size == 1 =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
          Seq(physName(s, a.nameParts.head)))
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        a.withName(physName(s, a.name))
    }

  /** Multi-part attribute paths in a PARSED (unresolved) predicate
    * bound to the table's struct columns: `meta.n` becomes a resolved
    * `GetStructField` chain over an `AttributeReference(meta)` — the
    * shape [[Skipping]] maps to the footer's dotted leaf stats key, so
    * the SQL-string row ops (deleteWhere/updateWhere/overwriteWhere)
    * prune files on struct-LEAF predicates like the planner path does.
    * Sound inside this seam: row-op predicates evaluate against the
    * BARE table frame (no aliases), so a multi-part name can only be a
    * struct path — and any part that does not resolve is left
    * untouched (the evaluator then conservatively keeps every file,
    * and the actual filter raises its own resolution error).
    */
  private[ext] def resolveStructPaths(s: Snapshot,
                                      e: org.apache.spark.sql.catalyst.expressions.Expression)
  : org.apache.spark.sql.catalyst.expressions.Expression =
    tableSchema(s) match {
      case None => e
      case Some(schema) =>
        import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, GetStructField}
        import org.apache.spark.sql.types.StructType
        def descend(cur: Expression,
                    t: org.apache.spark.sql.types.DataType,
                    parts: List[String]): Option[Expression] = parts match {
          case Nil => Some(cur)
          case p :: rest => t match {
            case st: StructType =>
              val idx = st.fields.indexWhere(_.name.equalsIgnoreCase(p))
              if (idx < 0) None
              else descend(GetStructField(cur, idx,
                Some(st.fields(idx).name)), st.fields(idx).dataType, rest)
            case _ => None
          }
        }
        e.transformUp {
          case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if ua.nameParts.size > 1 =>
            schema.fields.find(f =>
              f.name.equalsIgnoreCase(ua.nameParts.head) &&
                f.dataType.isInstanceOf[StructType]) match {
              case Some(root) =>
                descend(AttributeReference(root.name, root.dataType,
                    root.nullable)(), root.dataType,
                  ua.nameParts.tail.toList).getOrElse(ua)
              case None => ua
            }
        }
    }

  /** The full (logical → physical) list for every schema column —
    * existing mapping entries kept, unmapped columns identity — the
    * base every rename/drop redefinition starts from.
    */
  private[ext] def fullColMap(s: Snapshot,
                         schema: org.apache.spark.sql.types.StructType)
  : Seq[(String, String)] =
    schema.fields.toSeq.map(f => f.name -> physName(s, f.name))

  /** One data file's value for one PARTITION column: the canonical
    * comparison family (the [[Skipping]] vocabulary — "long", "string",
    * "bool") and the value in canonical form; None = the hive null
    * partition. Exact by construction — the partitioned write puts every
    * row of the file in this partition — so pruning on it is equality
    * against a point, not a [min, max] interval (same machinery, always
    * tight).
    */
  final case class PartValue(fam: String, value: Option[String])

  /** The recorded table schema of a snapshot, if this table tracks one. */
  def tableSchema(s: Snapshot): Option[org.apache.spark.sql.types.StructType] =
    s.schemaJson.map(j => org.apache.spark.sql.types.DataType.fromJson(j)
      .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** SCHEMA EVOLUTION policy, evaluated inside every append's commit
    * callback (so a CAS retry re-merges against the fresh head):
    *
    *   - a column new to the table is APPENDED, forced nullable (files
    *     written before it existed null-fill it on read);
    *   - a column the batch lacks is fine (the batch's rows null-fill);
    *   - a column changing its data type is REJECTED loudly — silent
    *     widening is how readers end up binding the wrong parquet
    *     decoder at depth in a 100 TB table.
    *
    * Tables created before schema tracking (files exist, no schema
    * line) stay schema-less: we cannot know what columns their old
    * files hold without a footer sweep, so guessing would be worse
    * than today's behavior.
    */
  private[ext] def mergedSchemaJson(old: Snapshot,
                               incoming: org.apache.spark.sql.types.StructType)
  : Option[String] = {
    import org.apache.spark.sql.types.StructType
    def nullable(s: StructType) = StructType(s.fields.map(_.copy(nullable = true)))
    tableSchema(old) match {
      case None =>
        if (old.files.isEmpty) Some(nullable(incoming).json) else None
      case Some(cur) =>
        val merged = incoming.fields.foldLeft(cur) { (acc, fd) =>
          acc.fields.find(_.name.equalsIgnoreCase(fd.name)) match {
            case Some(ex) =>
              // nullability-insensitive at EVERY nesting depth: a batch
              // whose named_struct literals carry non-nullable inner
              // fields (or a non-containsNull array) is the same TYPE —
              // strict equality here rejected every struct-column
              // INSERT while printing two identical simpleStrings
              require(org.apache.spark.sql.graft.GraftSqlShims
                  .sameTypeIgnoreNullability(ex.dataType, fd.dataType),
                s"schema evolution cannot change column ${fd.name}: " +
                  s"${ex.dataType.simpleString} -> ${fd.dataType.simpleString}")
              acc
            case None =>
              // a batch may not re-introduce a DROPPED column's physical
              // name (old files still hold those bytes — binding to them
              // would resurrect deleted data) or shadow another column's
              // physical slot; ALTER TABLE ADD COLUMN assigns a fresh
              // physical name for exactly this case
              val takenPhys = old.colMap.collect {
                case (l, ph) if !l.equalsIgnoreCase(fd.name) => ph }
              require(!(old.retiredCols ++ takenPhys)
                  .exists(_.equalsIgnoreCase(fd.name)),
                s"column ${fd.name} collides with a dropped or renamed " +
                  "column's physical name — add it via ALTER TABLE ... " +
                  "ADD COLUMN (which assigns a fresh physical slot) first")
              StructType(acc.fields :+ fd.copy(nullable = true))
          }
        }
        Some(merged.json)
    }
  }

  /** Read `names` under `data/` with the snapshot's recorded schema when
    * one exists — every file projects the FULL table column set (files
    * predating a column null-fill it); without a recorded schema the
    * parquet reader's first-footer schema applies, as before.
    *
    * Files carrying DELETION VECTORS get them applied here — merge-on-
    * read: the file is scanned with its hidden `_metadata` file/position
    * columns and anti-joined against the referenced `_dv/` position
    * sets (small by construction — a point delete's DV is a handful of
    * rows — so Spark broadcasts the probe side; the big scan never
    * shuffles). Every DataFrame face of the table (read, readWhere,
    * readVersion, the feeds, compact's rewrite, the row ops' candidate
    * reads) flows through this method, so DV semantics hold everywhere
    * by construction.
    */
  /** `names` of `s` read with their deletion vectors applied — the seam
    * [[ManifestPlan.dataFrame]]'s DV branch reads through (same
    * primitive as [[read]]).
    */
  private[graft] def readDvApplied(spark: SparkSession, dir: String,
                                   s: Snapshot,
                                   names: Seq[String]): DataFrame =
    readFiles(spark, dir, s, names)

  private[ext] def readFiles(spark: SparkSession, dir: String, s: Snapshot,
                        names: Seq[String]): DataFrame = {
    val (dvd, clean) = names.partition(n => s.dvs.get(n).exists(_.nonEmpty))
    if (dvd.isEmpty) toLogical(s, plainRead(spark, dir, s, names))
    else {
      val fm = "_graft_meta_file"
      val pm = "_graft_meta_pos"
      // readWithPos already returns LOGICAL names (it renames after
      // capturing the _metadata columns)
      val applied = readWithPos(spark, dir, s, dvd, fm, pm).drop(fm, pm)
      if (clean.isEmpty) applied
      else applied.unionByName(toLogical(s, plainRead(spark, dir, s, clean)))
    }
  }

  /** The PHYSICAL frame of `names`: files bind by their written column
    * names ([[physSchema]]); callers surface it through [[toLogical]].
    */
  private[ext] def plainRead(spark: SparkSession, dir: String, s: Snapshot,
                        names: Seq[String]): DataFrame =
    tableSchema(s).fold(spark.read)(sc =>
      spark.read.schema(physSchema(s, sc)))
      .parquet(names.map(n => dataFilePath(dir, n)): _*)

  /** `names` read with two extra columns (`fm` = data file NAME, `pm` =
    * physical row position from `_metadata.row_index`), with the files'
    * existing deletion vectors already APPLIED — the shared primitive
    * under DV-aware reads and DV creation (a new vector computed on this
    * view can never mark an already-deleted position twice, which is
    * what keeps per-ref `rows` counts additive).
    */
  private[ext] def readWithPos(spark: SparkSession, dir: String, s: Snapshot,
                          names: Seq[String], fm: String,
                          pm: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, element_at, split}
    // the hidden _metadata column must be referenced on the RAW scan
    // frame; the logical rename comes after (meta/dv columns are not in
    // the mapping, so toLogical passes them through)
    val base = toLogical(s, plainRead(spark, dir, s, names)
      .withColumn(fm, element_at(split(col("_metadata.file_path"), "/"), -1))
      .withColumn(pm, col("_metadata.row_index")))
    val refs = names.flatMap(n => s.dvs.getOrElse(n, Seq.empty))
      .map(_.name).distinct
    if (refs.isEmpty) base
    else {
      val dv = spark.read.parquet(refs.map(n => s"${dvDir(dir)}/$n"): _*)
        .select(col(DvFileCol), col(DvPosCol))
      base.join(dv,
        base(fm) === dv(DvFileCol) && base(pm) === dv(DvPosCol),
        "left_anti")
    }
  }

  /** Column names inside a `_dv/` sidecar dataset: the data file's NAME
    * (not path — tables relocate) and the 0-based physical row position
    * within it (`_metadata.row_index`, stable because data files are
    * immutable).
    */
  private[ext] val DvFileCol = "_graft_dv_file"
  private[ext] val DvPosCol = "_graft_dv_pos"

  private[ext] def manifestDir(dir: String) = s"$dir/_manifest"
  private[ext] def dataDir(dir: String) = s"$dir/data"

  /** A manifest file entry resolved to its storage path. Entries are
    * normally bare UUID names under `data/`; a SHALLOW CLONE
    * ([[shallowClone]]) records ABSOLUTE paths into the source table's
    * data directory instead — zero data-file copies — and every reader
    * resolves through this seam. Copy-on-write rewrites replace
    * absolute entries with ordinary relative ones, so a clone
    * un-shares exactly the files it mutates.
    */
  private[ext] def dataFilePath(dir: String, name: String): String =
    if (name.startsWith("/") || name.contains("://")) name
    else s"${dataDir(dir)}/$name"
  private[ext] def bloomDir(dir: String) = s"$dir/_bloom"
  // colName lowercased so the write side (caller-supplied bloomCols case)
  // and the probe side (eqConjuncts' lowercased attribute names) agree on
  // the sidecar name; without it a Seq("UserId") sidecar is never consulted.
  private[ext] def bloomPath(dir: String, file: String, colName: String) =
    s"${bloomDir(dir)}/$file.${enc(colName.toLowerCase)}.bloom"

  // ---------------------------------------------- the commit log
  //
  // INCREMENTAL, the Delta-log design: every commit publishes one small
  // DELTA file `d<NNNNNNNN>` holding only that commit's ACTIONS
  // (add:/remove: files + the new files' stats, newly absorbed batch
  // ids, op kind, schema-if-changed, cdc/dv references) — O(change)
  // bytes, never O(table). Every [[CheckpointInterval]]-th commit also
  // writes a FULL listing `v<NNNNNNNN>` (a CHECKPOINT — the exact
  // pre-r12 manifest format), so resolution replays at most
  // CheckpointInterval deltas past the nearest checkpoint, and a table
  // committed every 10 s for a year never rewrites its million-file
  // listing per commit. Pre-incremental tables (all `v` files) read
  // unchanged: a full manifest IS a checkpoint.

  /** The (checkpoint, delta) log files of a table, from ONE listing of
    * `_manifest/` — O(versions) names, no data I/O. `{8,}`: versions
    * past 10^8 widen the zero-padded name rather than vanish (numeric
    * max below).
    */
  private[ext] final case class LogFiles(
      ckpt: Map[Long, org.apache.hadoop.fs.FileStatus],
      delta: Map[Long, org.apache.hadoop.fs.FileStatus]) {
    def head: Long =
      (ckpt.keysIterator ++ delta.keysIterator).foldLeft(0L)(math.max)
    def has(v: Long): Boolean = ckpt.contains(v) || delta.contains(v)
  }

  /** Directory LISTINGS of `_manifest/` this JVM — the observable proof
    * the `_last_checkpoint` pointer path never lists (a 10 s-cadence
    * streaming sink writes millions of log names over a year; a LIST
    * per `snapshot()`/`getOffset` is the throttled path on object
    * stores, and O(all versions ever) names on any store).
    */
  private[graft] val logListings =
    new java.util.concurrent.atomic.AtomicLong()

  private[ext] def listLog(spark: SparkSession, dir: String): LogFiles = {
    logListings.incrementAndGet()
    val f = fs(spark, dir)
    val md = p(manifestDir(dir))
    if (!f.exists(md)) return LogFiles(Map.empty, Map.empty)
    val sts = f.listStatus(md).filter(_.isFile)
    LogFiles(
      sts.filter(_.getPath.getName.matches("v\\d{8,}"))
        .map(s => s.getPath.getName.drop(1).toLong -> s).toMap,
      sts.filter(_.getPath.getName.matches("d\\d{8,}"))
        .map(s => s.getPath.getName.drop(1).toLong -> s).toMap)
  }

  // ------------------------------------- the _last_checkpoint pointer
  //
  // Delta's design: a tiny `_manifest/_last_checkpoint` file names the
  // latest checkpoint version, so HEAD resolution is one pointer read +
  // one getFileStatus per version SINCE that checkpoint (forward
  // existence probes — versions are dense by CAS construction, so the
  // first missing delta IS the head), never a listing of the whole log
  // directory. The pointer is a HINT, not a commit: it is overwritten
  // in place (monotonically — a racing writer can only lose to a newer
  // checkpoint), and any torn read, missing file or stale value falls
  // back to the full listing / extra delta replays, costing speed only.

  private def lastCheckpointPath(dir: String) =
    p(s"${manifestDir(dir)}/_last_checkpoint")

  private[ext] def readLastCheckpoint(spark: SparkSession,
                                 dir: String): Option[Long] =
    try {
      val f = fs(spark, dir)
      val in = f.open(lastCheckpointPath(dir))
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
      val v = s.toLong
      if (v > 0L) Some(v) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  private[ext] def writeLastCheckpoint(spark: SparkSession, dir: String,
                                  v: Long): Unit =
    try {
      if (readLastCheckpoint(spark, dir).forall(_ < v)) {
        val f = fs(spark, dir)
        val out = f.create(lastCheckpointPath(dir), true)
        try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** The log reachable FROM THE POINTER: the pointed-at checkpoint, any
    * newer checkpoint on the deterministic [[CheckpointInterval]] grid
    * (one probe — covers a stale pointer), and the deltas probed
    * forward until the first gap. O(head - checkpoint) getFileStatus
    * calls, NO directory listing. None = no pointer / pointed-at
    * checkpoint missing — caller falls back to [[listLog]].
    */
  private def probeLog(spark: SparkSession, dir: String): Option[LogFiles] =
    readLastCheckpoint(spark, dir).flatMap { c =>
      val f = fs(spark, dir)
      def stat(name: String): Option[org.apache.hadoop.fs.FileStatus] =
        try Some(f.getFileStatus(p(s"${manifestDir(dir)}/$name")))
        catch { case _: java.io.FileNotFoundException => None }
      stat(s"v${"%08d".format(c)}").map { ckptSt =>
        var ckpt = Map(c -> ckptSt)
        var delta = Map.empty[Long, org.apache.hadoop.fs.FileStatus]
        var w = c + 1L
        var miss = false
        while (!miss) {
          stat(s"d${"%08d".format(w)}") match {
            case Some(st) => delta += (w -> st); w += 1L
            case None => miss = true
          }
        }
        val head = w - 1L
        // a stale pointer (checkpoint write raced or a later one landed
        // after this reader cached the pointer): the newest checkpoint
        // sits on the interval grid — one extra probe recovers it and
        // keeps replay bounded by the interval, not the staleness
        val gridC = (head / CheckpointInterval) * CheckpointInterval
        if (gridC > c)
          stat(s"v${"%08d".format(gridC)}").foreach(st => ckpt += (gridC -> st))
        LogFiles(ckpt, delta)
      }
    }

  /** [[probeLog]] when the pointer exists, else one full listing — the
    * HEAD-resolution entry point for [[snapshot]]/[[headVersion]]/
    * [[commit]]. Time travel, history and expiry keep the full listing
    * (they need versions BEHIND the pointer).
    */
  private def headLog(spark: SparkSession, dir: String): LogFiles =
    probeLog(spark, dir).getOrElse(listLog(spark, dir))

  /** DRIVER SNAPSHOT CACHE. Snapshots are immutable once committed, so a
    * resolved version caches forever; the key carries the log file's
    * (length, mtime) identity — plus the PREVIOUS version's file
    * identity when the listing has it — so a table DELETED AND RECREATED
    * at the same path can only serve a stale snapshot if BOTH adjacent
    * new log files collide with the old ones on (length, mtime), two
    * independent coincidences even on coarse-mtime filesystems. (Exact
    * identity would need a content read per resolve — the RPC the cache
    * exists to avoid.) `getOffset` every trigger and repeated
    * `snapshot()` calls become one `_manifest/` listing + a map hit:
    * zero parse, zero O(files) work. Overflow evicts ONE arbitrary
    * entry, not the map — a 300-table driver keeps its working set.
    */
  private val snapCache =
    new java.util.concurrent.ConcurrentHashMap[String, Snapshot]()
  private[graft] var snapCacheMaxForTest = 256

  private def cacheKey(dir: String, v: Long, log: LogFiles): Option[String] =
    log.ckpt.get(v) match {
      // a checkpoint is a full-state file — its own (len, mtime) is the
      // identity (v-1 may be absent from a pointer-probed listing, so
      // folding it in would make the key listing-dependent)
      case Some(st) => Some(s"$dir#$v#${st.getLen}#${st.getModificationTime}")
      case None => log.delta.get(v).map { st =>
        // delta-keyed: fold in v-1's file identity, present in EVERY
        // listing that can see delta v (probeLog probes forward from its
        // checkpoint; listLog sees everything) — log files are immutable
        // once published, so the suffix is stable across resolves
        val prev = log.ckpt.get(v - 1L).orElse(log.delta.get(v - 1L))
          .map(ps => s"#${ps.getLen}#${ps.getModificationTime}").getOrElse("")
        s"$dir#$v#${st.getLen}#${st.getModificationTime}$prev"
      }
    }

  private def cachePut(key: Option[String], s: Snapshot): Unit = key.foreach {
    k =>
      while (snapCache.size >= snapCacheMaxForTest) {
        val it = snapCache.keySet.iterator
        if (it.hasNext) snapCache.remove(it.next()) else snapCache.clear()
      }
      snapCache.put(k, s)
  }

  private[graft] def snapshotCacheSizeForTest: Int = snapCache.size

  /** Log files parsed this JVM (checkpoints + deltas) — the observable
    * proof the snapshot cache works: an unchanged table's repeated
    * `snapshot()` adds zero.
    */
  private[graft] val logFileReads =
    new java.util.concurrent.atomic.AtomicLong()

  /** Test seam: a cleared cache simulates a FRESH DRIVER resolving the
    * table cold — what the checkpoint cadence bounds.
    */
  private[graft] def clearSnapshotCacheForTest(): Unit = snapCache.clear()

  /** Resolve `v` against an already-taken listing: nearest cached
    * version or checkpoint at-or-below `v`, then replay the deltas up to
    * `v` (each at most once per JVM — intermediates cache too). Cost is
    * O(deltas since checkpoint) small file reads on a cold cache, a map
    * hit on a warm one.
    */
  private[ext] def resolveAt(spark: SparkSession, dir: String, v: Long,
                        log: LogFiles): Snapshot = {
    if (v == 0L) return Snapshot(0L, Seq.empty, Set.empty)
    var w = v
    var base = Snapshot(0L, Seq.empty, Set.empty)
    var found = false
    while (!found && w > 0L) {
      val cached = cacheKey(dir, w, log).flatMap(k => Option(snapCache.get(k)))
      cached match {
        case Some(s) => base = s; found = true
        case None if log.ckpt.contains(w) =>
          base = readManifest(spark, dir, w)
          cachePut(cacheKey(dir, w, log), base)
          found = true
        case None =>
          require(log.delta.contains(w),
            s"ManifestTable at $dir: the log has no file for version $w " +
              "(manifest directory corrupted?)")
          w -= 1
      }
    }
    var cur = base
    ((base.version + 1L) to v).foreach { u =>
      cur = applyDelta(cur, readDelta(spark, dir, u), u)
      cachePut(cacheKey(dir, u, log), cur)
    }
    cur
  }

  /** Resolve the table's current snapshot: the highest committed version
    * in the log. A half-written log file can never be resolved — they
    * appear only by atomic link/rename.
    */
  def snapshot(spark: SparkSession, dir: String): Snapshot = {
    val log = headLog(spark, dir)
    val head = log.head
    if (head == 0L) Snapshot(0L, Seq.empty, Set.empty)
    else resolveAt(spark, dir, head, log)
  }

  /** The table's current committed version WITHOUT resolving the
    * snapshot — a pointer read + O(since-checkpoint) existence probes
    * (one directory listing on pointer-less tables), zero parse. What a
    * streaming source's per-trigger `getOffset` should pay.
    */
  def headVersion(spark: SparkSession, dir: String): Long =
    headLog(spark, dir).head

  /** The snapshot as of manifest `version` — TIME TRAVEL. Any version
    * inside the [[expireLog]] retention window resolves (deltas are
    * O(change); checkpoints kilobytes per thousand files) as long as
    * [[vacuum]]'s grace window has not swept the data files it
    * references; a pinned reader inside the window sees the exact
    * historical table. Versions expired from the log raise here.
    */
  def snapshotAt(spark: SparkSession, dir: String, version: Long): Snapshot = {
    val log = listLog(spark, dir)
    require(log.has(version),
      s"ManifestTable at $dir has no manifest version $version")
    resolveAt(spark, dir, version, log)
  }

  /** Read rows as of manifest `version` (see [[snapshotAt]]). The
    * version's OWN recorded schema applies — a column added later does
    * not exist in the historical read, exactly as it didn't then.
    */
  def readVersion(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val s = snapshotAt(spark, dir, version)
    require(s.files.nonEmpty,
      s"ManifestTable at $dir version $version has no data files")
    readFiles(spark, dir, s, s.files)
  }

  /** The newest version committed at or before `tsMillis` — time travel
    * by TIMESTAMP. A commit's time is its published log file's mtime
    * (immutable once linked into place; the delta preferred, a
    * checkpoint standing in when [[expireLog]] dropped the delta).
    * Raises when `tsMillis` predates the oldest retained commit: an
    * expired-history read must fail loudly, never resolve to a
    * different version than it would have yesterday.
    */
  def versionAt(spark: SparkSession, dir: String, tsMillis: Long): Long = {
    val log = listLog(spark, dir)
    val times = (log.delta.keySet ++ log.ckpt.keySet).toSeq.map(v =>
      v -> log.delta.get(v).orElse(log.ckpt.get(v)).get.getModificationTime)
    require(times.nonEmpty, s"ManifestTable at $dir has no commits")
    val at = times.filter(_._2 <= tsMillis)
    require(at.nonEmpty,
      s"ManifestTable at $dir: no commit at or before $tsMillis " +
        s"(oldest retained commit is v${times.minBy(_._2)._1} at " +
        s"${times.map(_._2).min}) — the requested history is expired " +
        "or predates the table")
    at.maxBy(_._1)._1
  }

  /** [[readVersion]] keyed by timestamp (see [[versionAt]]). */
  def readTimestamp(spark: SparkSession, dir: String,
                    tsMillis: Long): DataFrame =
    readVersion(spark, dir, versionAt(spark, dir, tsMillis))

  /** RESTORE the table to version `v`'s state — one metadata commit
    * that makes the target's files/stats/sizes/DVs/schema the new head,
    * rewriting nothing. The intervening history is NOT erased: the
    * restore is itself a new version, so the mis-step stays auditable
    * and a second restore can undo the first. Current CHECK constraints
    * and the partition layout are KEPT (they are table properties, not
    * data), and absorbed batch/op ids stay absorbed — a replayed append
    * from before the restore still no-ops. Raises if any restored file
    * was already vacuumed past the grace window (a restore must be
    * whole or not at all). The append feed refuses a restore commit
    * (it un-deletes and un-inserts — not expressible as appends); the
    * CHANGE feed spans it: [[changesBetween]] synthesizes the commit's
    * record as the snapshot diff ([[restoreDiffFrame]]), so CDC
    * consumers survive an upstream rewind.
    */
  def restore(spark: SparkSession, dir: String, v: Long,
              opId: String): Boolean = {
    val target = snapshotAt(spark, dir, v)
    val f = fs(spark, dir)
    val head0 = snapshot(spark, dir)
    if (head0.batchIds.contains(opId)) return false
    // files the restore would resurrect must still exist on disk
    val missing = target.files.filterNot(head0.files.contains)
      .filterNot(n => f.exists(p(s"${dataDir(dir)}/$n")))
    require(missing.isEmpty,
      s"restore to v$v needs ${missing.size} data file(s) already " +
        s"vacuumed past the grace window (first: ${missing.headOption
          .getOrElse("")}) — the version is no longer restorable")
    commit(spark, dir) { old =>
      if (old.batchIds.contains(opId)) None
      else Some(old.copy(
        files = target.files,
        stats = target.stats,
        sizes = target.sizes,
        pvals = target.pvals,
        ndv = target.ndv,
        dvs = target.dvs,
        schemaJson = target.schemaJson.orElse(old.schemaJson),
        // the target's column mapping travels with its schema (a
        // restore past a RENAME restores the old logical names bound
        // to the same physical bytes); retired physical names only
        // ever ACCUMULATE — un-retiring one could let a later ADD
        // rebind bytes a drop had orphaned. A pre-mapping target is
        // written as an explicit IDENTITY mapping, never Nil: the log's
        // absent-inherits rule cannot express "mapping cleared"
        colMap =
          if (target.colMap.nonEmpty) target.colMap
          else if (old.colMap.isEmpty) Nil
          else tableSchema(target).orElse(tableSchema(old))
            .map(sc => fullColMap(target, sc)).getOrElse(old.colMap),
        retiredCols = (target.retiredCols ++ old.retiredCols).distinct,
        batchIds = old.batchIds + opId,
        op = "restore", cdcPath = None))
    }
  }

  private[ext] def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private[ext] def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  /** Log line format, shared by checkpoints and deltas. Readers ignore
    * unknown prefixes, so lines added after the format's first release
    * parse as absent on old manifests (files stay readable, never
    * pruned):
    *
    *   file:<name>                       CHECKPOINT: one per live file
    *   add:<name>                        DELTA: file added by the commit
    *   remove:<name>                     DELTA: file removed (rewrites)
    *   batch:<id>                        absorbed batch ids (checkpoint:
    *                                     all; delta: new this commit)
    *   op:<kind>                         the commit kind of THIS version
    *   schema:<jsonEnc>                  table schema (delta: only when
    *                                     the commit changed it)
    *   cdc:<dirname>                     CDC sidecar dir of THIS commit
    *   rows:<name>\t<rowCount>           one per file with footer stats
    *   col:<name>\t<colEnc>\t<typ>\t<nulls>\t<flag>\t<minEnc>\t<maxEnc>
    *   size:<name>\t<bytes>              file length at move time
    *   dv:<name>\t<dvName>\t<rows>       deletion-vector ref (checkpoint:
    *                                     all refs; delta: new refs)
    *   constraint:<nameEnc>\t<exprEnc>   CHECK constraint (delta: added)
    *   dropconstraint:<nameEnc>          DELTA: constraint dropped
    *   cleardv:<name>                    DELTA: the file's deletion-vector
    *                                     refs RESET before this delta's
    *                                     dv: lines (restore only)
    *   partcols:<colEnc>[\t<colEnc>...]  the table's PARTITION layout
    *                                     (declared at creation, immutable)
    *   pv:<name>\t<colEnc>\t<fam>\t<flag>\t<valEnc>
    *                                     one file's partition value for
    *                                     one column (flag 0 = the hive
    *                                     null partition)
    *   ndvcols:<colEnc>[\t<colEnc>...]   columns tracking NDV sketches
    *                                     (declared once, inherited)
    *   ndv:<name>\t<colEnc>\t<b64>       one file's per-column HLL
    *                                     sketch (Datasketches compact
    *                                     bytes, base64) — mergeable, so
    *                                     table NDV = union over files
    *   property:<kEnc>\t<vEnc>           a table property set (or, in a
    *                                     checkpoint, carried)
    *   dropproperty:<kEnc>               DELTA: a table property unset
    *   colmap:<logicalEnc>\t<physEnc>    COLUMN MAPPING entry (one per
    *                                     column; any present = the full
    *                                     current mapping, absent =
    *                                     inherit — the mapping never
    *                                     shrinks to empty once active)
    *   retired:<physEnc>                 a DROPPED column's physical
    *                                     name (same full-set-or-inherit
    *                                     rule as colmap)
    *
    * `flag` 1 = min/max present (URL-encoded canonical strings); 0 = the
    * column is entirely null in the file. Values are URL-encoded so
    * string min/max containing tabs or newlines cannot break the
    * line-oriented format.
    */
  private[ext] final case class ParsedLog(
      files: Seq[String], adds: Seq[String], removes: Seq[String],
      batchIds: Set[String], op: String,
      schemaJson: Option[String], cdcPath: Option[String],
      stats: Map[String, FileStats], sizes: Map[String, Long],
      dvs: Map[String, Seq[DvRef]], dvClear: Set[String],
      consAdd: Seq[(String, String)], consDrop: Set[String],
      partitionCols: Option[Seq[String]],
      pvals: Map[String, Map[String, PartValue]],
      ndvCols: Option[Seq[String]],
      ndv: Map[String, Map[String, String]],
      propsSet: Seq[(String, String)],
      propsUnset: Set[String],
      colMap: Option[Seq[(String, String)]],
      retired: Option[Seq[String]])

  private[ext] def parseLog(lines: List[String]): ParsedLog = {
    // limit -1: trailing empty fields SURVIVE the split. A column whose
    // min/max is the empty string writes "...\t1\t\t" (enc("") = ""), and
    // Java's default limit-0 split would drop those fields and brick every
    // snapshot() of the table with ArrayIndexOutOfBoundsException.
    val rowCounts = lines.filter(_.startsWith("rows:")).map { l =>
      val a = l.stripPrefix("rows:").split("\t", -1); (a(0), a(1).toLong)
    }.toMap
    val cols = lines.filter(_.startsWith("col:")).map { l =>
      val a = l.stripPrefix("col:").split("\t", -1)
      (a(0), dec(a(1)), ColStats(a(2),
        if (a(4) == "1") Some(dec(a(5))) else None,
        if (a(4) == "1") Some(dec(a(6))) else None, a(3).toLong))
    }.groupBy(_._1)
    val stats = rowCounts.map { case (file, n) =>
      file -> FileStats(n,
        cols.getOrElse(file, Nil).map(c => c._2 -> c._3).toMap)
    }
    ParsedLog(
      files = lines.filter(_.startsWith("file:")).map(_.stripPrefix("file:")),
      adds = lines.filter(_.startsWith("add:")).map(_.stripPrefix("add:")),
      removes = lines.filter(_.startsWith("remove:"))
        .map(_.stripPrefix("remove:")),
      batchIds = lines.filter(_.startsWith("batch:"))
        .map(_.stripPrefix("batch:")).toSet,
      op = lines.find(_.startsWith("op:")).map(_.stripPrefix("op:"))
        .getOrElse(""),
      schemaJson = lines.find(_.startsWith("schema:"))
        .map(l => dec(l.stripPrefix("schema:"))),
      cdcPath = lines.find(_.startsWith("cdc:")).map(_.stripPrefix("cdc:")),
      stats = stats,
      sizes = lines.filter(_.startsWith("size:")).map { l =>
        val a = l.stripPrefix("size:").split("\t", -1); (a(0), a(1).toLong)
      }.toMap,
      dvs = lines.filter(_.startsWith("dv:")).map { l =>
        val a = l.stripPrefix("dv:").split("\t", -1)
        (a(0), DvRef(a(1), a(2).toLong))
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) },
      dvClear = lines.filter(_.startsWith("cleardv:"))
        .map(_.stripPrefix("cleardv:")).toSet,
      consAdd = lines.filter(_.startsWith("constraint:")).map { l =>
        val a = l.stripPrefix("constraint:").split("\t", -1)
        (dec(a(0)), dec(a(1)))
      },
      consDrop = lines.filter(_.startsWith("dropconstraint:"))
        .map(l => dec(l.stripPrefix("dropconstraint:"))).toSet,
      // filter("" ) makes the EMPTY list round-trip: partColsLine(Nil)
      // serializes as a bare "partcols:" (REPLACE TABLE un-partitions),
      // and "" is never a real column name
      partitionCols = lines.find(_.startsWith("partcols:"))
        .map(_.stripPrefix("partcols:").split("\t", -1).toSeq.map(dec)
          .filter(_.nonEmpty)),
      pvals = lines.filter(_.startsWith("pv:")).map { l =>
        val a = l.stripPrefix("pv:").split("\t", -1)
        (a(0), dec(a(1)),
          PartValue(a(2), if (a(3) == "1") Some(dec(a(4))) else None))
      }.groupBy(_._1).map { case (file, vs) =>
        file -> vs.map(v => v._2 -> v._3).toMap
      },
      ndvCols = lines.find(_.startsWith("ndvcols:"))
        .map(_.stripPrefix("ndvcols:").split("\t", -1).toSeq.map(dec)
          .filter(_.nonEmpty)),
      ndv = lines.filter(_.startsWith("ndv:")).map { l =>
        val a = l.stripPrefix("ndv:").split("\t", -1)
        (a(0), dec(a(1)), a(2))
      }.groupBy(_._1).map { case (file, vs) =>
        file -> vs.map(v => v._2 -> v._3).toMap
      },
      propsSet = lines.filter(_.startsWith("property:")).map { l =>
        val a = l.stripPrefix("property:").split("\t", -1)
        (dec(a(0)), dec(a(1)))
      },
      propsUnset = lines.filter(_.startsWith("dropproperty:"))
        .map(l => dec(l.stripPrefix("dropproperty:"))).toSet,
      colMap = Some(lines.filter(_.startsWith("colmap:")).map { l =>
        val a = l.stripPrefix("colmap:").split("\t", -1)
        (dec(a(0)), dec(a(1)))
      }).filter(_.nonEmpty),
      retired = Some(lines.filter(_.startsWith("retired:"))
        .map(l => dec(l.stripPrefix("retired:")))).filter(_.nonEmpty))
  }

  private[ext] def readLogLines(spark: SparkSession, dir: String,
                           name: String): List[String] = {
    logFileReads.incrementAndGet()
    val f = fs(spark, dir)
    val in = f.open(p(s"${manifestDir(dir)}/$name"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** A CHECKPOINT (or a pre-incremental full manifest): the complete
    * table state at `v`.
    */
  private def readManifest(spark: SparkSession, dir: String,
                           v: Long): Snapshot = {
    val pl = parseLog(readLogLines(spark, dir, s"v${"%08d".format(v)}"))
    Snapshot(v, pl.files, pl.batchIds, pl.stats, pl.op, pl.schemaJson,
      pl.cdcPath, pl.sizes, pl.dvs, pl.consAdd.toMap,
      pl.partitionCols.getOrElse(Nil), pl.pvals,
      pl.ndvCols.getOrElse(Nil), pl.ndv, pl.propsSet.toMap,
      pl.colMap.getOrElse(Nil), pl.retired.getOrElse(Nil))
  }

  /** One commit's ACTIONS (the delta file for `v`). */
  private[ext] def readDelta(spark: SparkSession, dir: String,
                        v: Long): ParsedLog =
    parseLog(readLogLines(spark, dir, s"d${"%08d".format(v)}"))

  /** Apply one commit's actions to its base snapshot. Replay order is
    * canonical: survivors keep the base's order, added files append at
    * the end — exactly the shape every commit callback produces.
    */
  private def applyDelta(base: Snapshot, d: ParsedLog, v: Long): Snapshot = {
    val gone = d.removes.toSet
    Snapshot(v,
      files = base.files.filterNot(gone) ++ d.adds,
      batchIds = base.batchIds ++ d.batchIds,
      stats = base.stats -- gone ++ d.stats,
      op = d.op,
      schemaJson = d.schemaJson.orElse(base.schemaJson),
      cdcPath = d.cdcPath,
      sizes = base.sizes -- gone ++ d.sizes,
      dvs = d.dvs.foldLeft(base.dvs -- gone -- d.dvClear) {
        case (acc, (file, refs)) =>
          acc.updated(file, acc.getOrElse(file, Seq.empty) ++ refs)
      },
      constraints = base.constraints ++ d.consAdd -- d.consDrop,
      partitionCols = d.partitionCols.getOrElse(base.partitionCols),
      pvals = base.pvals -- gone ++ d.pvals,
      ndvCols = d.ndvCols.getOrElse(base.ndvCols),
      ndv = base.ndv -- gone ++ d.ndv,
      properties = base.properties ++ d.propsSet -- d.propsUnset,
      colMap = d.colMap.getOrElse(base.colMap),
      retiredCols = d.retired.getOrElse(base.retiredCols))
  }

  /** The snapshot's rows (schema comes from the listed files). A table
    * with no committed files yet raises — callers gate on
    * [[snapshot]].files.nonEmpty or supply their own empty frame.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val s = snapshot(spark, dir)
    require(s.files.nonEmpty, s"ManifestTable at $dir has no committed data")
    readFiles(spark, dir, s, s.files)
  }

  /** The layout an append must stage with: an existing table's declared
    * partition columns always win (a conflicting `partitionBy` request
    * is a loud error — partitioning is immutable, like Delta/Iceberg);
    * a nonempty `partitionBy` on a table with no files and no layout
    * DECLARES it, after validating every column exists with a
    * stats-faithful type (integral, string, boolean — the families
    * whose canonical form round-trips a hive directory name exactly).
    */
  private def resolveLayout(snap: Snapshot,
                            schema: org.apache.spark.sql.types.StructType,
                            partitionBy: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.types._
    if (snap.partitionCols.nonEmpty) {
      require(partitionBy.isEmpty ||
        partitionBy.map(_.toLowerCase) ==
          snap.partitionCols.map(_.toLowerCase),
        s"table is partitioned by (${snap.partitionCols.mkString(", ")}); " +
          s"an append cannot re-partition it by (${partitionBy.mkString(", ")})")
      snap.partitionCols
    } else if (partitionBy.isEmpty) Nil
    else {
      require(snap.files.isEmpty,
        "partitioning must be declared at table creation (the table " +
          "already has data files laid out without it)")
      validatePartitionDecl(schema, partitionBy)
      partitionBy
    }
  }

  /** Every declared partition column must exist in `schema` with a
    * stats-faithful type (see [[resolveLayout]]) — shared by the
    * first-append declaration and [[create]]'s DDL declaration.
    */
  private def validatePartitionDecl(
      schema: org.apache.spark.sql.types.StructType,
      partitionBy: Seq[String]): Unit = {
    import org.apache.spark.sql.types._
    partitionBy.foreach { c =>
      val fd = schema.fields.find(_.name.equalsIgnoreCase(c))
      require(fd.isDefined, s"partition column $c is not in the schema")
      require(fd.get.dataType match {
        case ByteType | ShortType | IntegerType | LongType |
             StringType | BooleanType | DateType => true
        case _ => false
      }, s"partition column $c has type ${fd.get.dataType.simpleString}; " +
        "only integral, string, boolean and date columns can partition")
    }
  }

  /** SHALLOW CLONE (`CALL system.clone`) — the dev/test idiom: one
    * metadata commit at `dstDir` referencing the SOURCE table's live
    * data files BY ABSOLUTE PATH (zero data-file copies; see
    * [[dataFilePath]]), carrying the full table surface — schema,
    * stats, sizes, NDV sketches, partition layout + values, CHECK
    * constraints, properties, column mapping. The clone is a fully
    * independent table from its first commit: writes land in its own
    * `data/`, copy-on-write DML replaces exactly the absolute entries
    * it touches with fresh relative files, and the source never sees
    * any of it. Vacuum liveness composes by construction — the clone's
    * vacuum only ever deletes from the clone's own data directory, so
    * cloned (absolute) files are never its candidates; conversely a
    * vacuum of the SOURCE cannot see the clone's references, the same
    * documented caveat Delta shallow clones carry. Bloom sidecars do
    * not travel (pruning falls back to stats until the clone rewrites
    * a file); deletion-vector sidecars cannot cross the boundary at
    * all, so a DV-carrying source must `purge_deletes` first — loud.
    * Returns the clone's head version (always 1).
    */
  def shallowClone(spark: SparkSession, srcDir: String,
                   dstDir: String): Long = {
    val s = snapshot(spark, srcDir)
    require(s.version > 0L, s"clone source $srcDir does not exist")
    require(s.dvs.isEmpty,
      s"clone source $srcDir carries deletion-vector sidecars, which " +
        "cannot cross the table boundary — run system.purge_deletes " +
        "(max_deleted_fraction => 0.0) first")
    require(s.files.forall(s.sizes.contains),
      s"clone source $srcDir predates size tracking — compact it first")
    val rekey: Map[String, String] =
      s.files.map(n => n -> dataFilePath(srcDir, n)).toMap
    def re[A](m: Map[String, A]): Map[String, A] =
      m.flatMap { case (k, v) => rekey.get(k).map(_ -> v) }
    val done = commit(spark, dstDir) { old =>
      require(old.version == 0L,
        s"clone target $dstDir already exists (v${old.version})")
      Some(old.copy(
        files = s.files.map(rekey),
        stats = re(s.stats),
        op = "clone",
        schemaJson = s.schemaJson,
        cdcPath = None,
        sizes = re(s.sizes),
        constraints = s.constraints,
        partitionCols = s.partitionCols,
        pvals = re(s.pvals),
        ndvCols = s.ndvCols,
        ndv = re(s.ndv),
        properties = s.properties,
        colMap = s.colMap,
        retiredCols = s.retiredCols))
    }
    require(done, s"clone commit to $dstDir did not land")
    snapshot(spark, dstDir).version
  }

  /** CREATE TABLE: declare the schema (and optional partition layout)
    * as version 1's METADATA COMMIT, before any data arrives — the SQL
    * DDL face's entry point ([[GraftCatalog]]). The tracked schema makes
    * an empty table readable (zero-file scan with real columns), and
    * the declared layout binds every later append exactly as a
    * first-append `partitionBy` would. Raises if the table already has
    * any committed version.
    */
  def create(spark: SparkSession, dir: String,
             schema: org.apache.spark.sql.types.StructType,
             partitionBy: Seq[String] = Nil): Unit = {
    validatePartitionDecl(schema, partitionBy)
    // pin the creating session's timezone for generated columns — the
    // contract [[withGeneratedDerived]] and [[requireGeneratedTz]]
    // enforce (harmless for timezone-free generation expressions)
    val tzProp: Map[String, String] =
      if (schema.fields.exists(fd => org.apache.spark.sql.catalyst.util
          .GeneratedColumn.getGenerationExpression(fd).isDefined))
        Map(GeneratedTzKey -> spark.sessionState.conf.sessionLocalTimeZone)
      else Map.empty
    commit(spark, dir) { old =>
      require(old.version == 0L,
        s"ManifestTable at $dir already exists (v${old.version})")
      Some(old.copy(schemaJson = Some(schema.json),
        partitionCols = partitionBy, properties = old.properties ++ tzProp,
        op = "create", cdcPath = None))
    }
    ()
  }

  /** True when `dir` holds a manifest table (any committed version). */
  def exists(spark: SparkSession, dir: String): Boolean =
    headVersion(spark, dir) > 0L

  /** ALTER TABLE ... ADD COLUMN as one metadata commit: the tracked
    * schema gains the column, FORCED nullable — files written before it
    * existed null-fill on read, the exact contract append-side schema
    * evolution already gives ([[mergedSchemaJson]]); no data moves.
    * Raises on a duplicate name or a schema-less legacy table.
    *
    * `default` = (currentSql, existsLiteralSql) carries `ADD COLUMN ...
    * DEFAULT`: Delta's TWO-FIELD protocol, riding the recorded schema's
    * field metadata under Spark's own keys. `CURRENT_DEFAULT` (the
    * declared SQL) fills future INSERTs that omit the column — and is
    * what a later SET/DROP DEFAULT changes. `EXISTS_DEFAULT` (the value
    * FROZEN to a literal at ADD time — `current_date()` evaluates once,
    * here) fills the column ON READ for every file that physically
    * lacks it — which is exactly the pre-ADD files, because every
    * engine write materializes the full column set. No read-path code
    * carries this: Spark's parquet readers (vectorized and not) apply
    * existence defaults from the read schema's field metadata per file
    * footer, on both the `spark.read.schema` path ([[plainRead]]) and
    * the `HadoopFsRelation` planner path ([[ManifestPlan.relation]]) —
    * a file that HAS the column keeps its values, NULLs included.
    * Rewrites read the filled view and write it physically, so the
    * pre-ADD file set only shrinks; a re-ADD after DROP binds a fresh
    * physical slot, so a retired column's bytes (and its old default)
    * can never resurface.
    */
  def addColumn(spark: SparkSession, dir: String, name: String,
                dataType: org.apache.spark.sql.types.DataType,
                default: Option[(String, String)] = None): Boolean =
    commit(spark, dir) { old =>
      val cur = tableSchema(old).getOrElse(throw new IllegalStateException(
        s"ManifestTable at $dir tracks no schema (created before schema " +
          "tracking) — ALTER has nothing to evolve"))
      require(!cur.fields.exists(_.name.equalsIgnoreCase(name)),
        s"column $name already exists in $dir")
      // the new column's PHYSICAL slot: its own name, unless a dropped
      // or renamed column already owns those bytes — then a fresh
      // version-stamped name, so re-adding a dropped column can never
      // resurrect its old data (the column-mapping contract)
      val taken = (old.retiredCols ++ old.colMap.map(_._2))
        .map(_.toLowerCase).toSet
      val phys =
        if (!taken.contains(name.toLowerCase)) name
        else {
          val candidate = Iterator.from(old.version.toInt + 1)
            .map(v => s"${name}_r$v")
            .find(c => !taken.contains(c.toLowerCase)).get
          candidate
        }
      val fieldMeta = default match {
        case None => org.apache.spark.sql.types.Metadata.empty
        case Some((curSql, existsSql)) =>
          // parse both now: a default that cannot parse must fail the
          // ALTER, not every later INSERT/read
          spark.sessionState.sqlParser.parseExpression(curSql)
          spark.sessionState.sqlParser.parseExpression(existsSql)
          new org.apache.spark.sql.types.MetadataBuilder()
            .putString("CURRENT_DEFAULT", curSql)
            .putString("EXISTS_DEFAULT", existsSql)
            .build()
      }
      val newSchema = org.apache.spark.sql.types.StructType(
        cur.fields :+ org.apache.spark.sql.types.StructField(
          name, dataType, nullable = true, fieldMeta))
      val newMap =
        if (old.colMap.isEmpty && phys == name) Nil // stay identity
        else fullColMap(old, cur) :+ (name -> phys)
      Some(old.copy(schemaJson = Some(newSchema.json), colMap = newMap,
        op = "metadata", cdcPath = None))
    }

  /** `[CREATE OR] REPLACE TABLE [AS SELECT]` as ONE atomic manifest
    * commit — the whole definition (schema, partition layout,
    * properties; constraints and NDV tracking reset with it) and the
    * whole contents swap together, and the table's HISTORY SURVIVES:
    * the replace is just the next version, so time travel still answers
    * below it, [[restore]] can undo it, and the old data files stay on
    * disk under the same vacuum grace/liveness rules as any rewrite.
    * (Spark's non-staging fallback is `DROP TABLE` + `CREATE` — a
    * destructive, non-atomic pair that erases the log; the
    * [[GraftCatalog]] staging seam routes REPLACE here instead.)
    *
    * `data` (the AS SELECT frame, None for a bare definition) stages
    * invisibly like an append, aligned and cast to the DECLARED schema;
    * the commit then atomically points the manifest at exactly those
    * files. A crash before the commit strands orphans, never a
    * half-replaced table. Column mapping resets to identity over the
    * new schema (the new files bind their own names; retired physical
    * names stay retired). Returns false on a replayed `opId`.
    */
  def replaceTable(spark: SparkSession, dir: String,
                   data: Option[DataFrame],
                   schema: org.apache.spark.sql.types.StructType,
                   partitionBy: Seq[String],
                   properties: Map[String, String], opId: String,
                   mustExist: Boolean = false,
                   mayExist: Boolean = true): Boolean = {
    import org.apache.spark.sql.functions.col
    validatePartitionDecl(schema, partitionBy)
    val f = fs(spark, dir)
    val head0 = snapshot(spark, dir)
    if (head0.batchIds.contains(opId)) return false
    if (mustExist) require(head0.version > 0L,
      s"REPLACE TABLE: no table at $dir (use CREATE OR REPLACE)")
    if (!mayExist) require(head0.version == 0L,
      s"ManifestTable at $dir already exists (v${head0.version})")
    val staged = data.map { df =>
      val aligned = df.select(schema.fields.map(fd =>
        col(fd.name).cast(fd.dataType).as(fd.name)).toSeq: _*)
      val stage = s"$dir/_stage/${java.util.UUID.randomUUID()}"
      stageWrite(aligned, stage, partitionBy)
      val (moved, sizes, pvals) =
        moveToData(f, dir, stage, partFamilies(schema, partitionBy))
      val stats = footerStats(spark, dir, moved)
      val live = dropEmpty(f, dir, moved, stats)
      (live, stats, sizes, pvals)
    }
    val (live, stats, sizes, pvals) = staged.getOrElse(
      (Seq.empty[String], Map.empty[String, FileStats],
        Map.empty[String, Long], Map.empty[String, Map[String, PartValue]]))
    commit(spark, dir) { old =>
      if (old.batchIds.contains(opId)) None
      else Some(old.copy(
        files = live,
        stats = stats.view.filterKeys(live.toSet).toMap,
        sizes = sizes.view.filterKeys(live.toSet).toMap,
        pvals = pvals.view.filterKeys(live.toSet).toMap,
        ndv = Map.empty, ndvCols = Nil,
        dvs = Map.empty,
        schemaJson = Some(schema.json),
        partitionCols = partitionBy,
        constraints = Map.empty,
        // REPLACE re-pins the generated-column timezone to the replacing
        // session (the data was just rewritten in it) — same contract
        // as [[create]]
        properties = properties ++
          (if (schema.fields.exists(fd => org.apache.spark.sql.catalyst
              .util.GeneratedColumn.getGenerationExpression(fd).isDefined))
            Map(GeneratedTzKey ->
              spark.sessionState.conf.sessionLocalTimeZone)
          else Map.empty),
        // fresh identity over the new schema; an explicit identity list
        // when a mapping was active (absent-inherits cannot express
        // "cleared" — same rule as restore), retired names accumulate
        colMap =
          if (old.colMap.isEmpty) Nil
          else schema.fields.toSeq.map(fd => fd.name -> fd.name),
        retiredCols = old.retiredCols,
        batchIds = old.batchIds + opId,
        op = "replace", cdcPath = None))
    }
  }

  /** ALTER TABLE ... ALTER COLUMN ... TYPE, restricted to WIDENING
    * within a stats family (byte → short → int → long; float → double)
    * — one metadata commit, zero rewrites. Sound because both the
    * parquet read path and the manifest's pruning metadata are already
    * family-canonical: Spark 4's vectorized reader upcasts a narrower
    * physical column into the wider requested type, and [[Skipping]]
    * records every integral column's stats, blooms and partition
    * values under the one `long` family (floats under `double`), so a
    * predicate on the widened column prunes old files exactly as
    * before. Anything outside the lattice — narrowing, cross-family,
    * string/decimal games — stays a loud error: it would bind the
    * wrong decoder or silently corrupt comparisons at depth.
    * (Scala `append` stays strict — batches must carry the widened
    * type; the SQL INSERT path coerces to the table schema itself.)
    */
  def widenColumnType(spark: SparkSession, dir: String, name: String,
                      to: org.apache.spark.sql.types.DataType): Boolean =
    commit(spark, dir) { old =>
      import org.apache.spark.sql.types._
      val cur = tableSchema(old).getOrElse(throw new IllegalStateException(
        s"ManifestTable at $dir tracks no schema — ALTER has nothing " +
          "to widen"))
      val fd = cur.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name does not exist in $dir"))
      val widens = (fd.dataType, to) match {
        case (ByteType, ShortType | IntegerType | LongType) => true
        case (ShortType, IntegerType | LongType) => true
        case (IntegerType, LongType) => true
        case (FloatType, DoubleType) => true
        case _ => false
      }
      require(widens,
        s"unsupported ALTER COLUMN TYPE on $name: " +
          s"${fd.dataType.simpleString} -> ${to.simpleString} is not a " +
          "widening within a stats family (byte -> short -> int -> long, " +
          "float -> double)")
      Some(old.copy(schemaJson = Some(StructType(cur.fields.map(f =>
        if (f eq fd) f.copy(dataType = to) else f)).json),
        op = "metadata", cdcPath = None))
    }

  /** ALTER TABLE ... ALTER COLUMN ... SET / DROP NOT NULL as one
    * metadata commit. DROP NOT NULL is pure metadata (a wider contract
    * is always safe). SET NOT NULL first VALIDATES EXISTING ROWS — one
    * aggregate over the DV-aware read, inside the commit callback so a
    * CAS retry re-validates against rows a racing append just landed
    * (the [[addConstraint]] discipline) — then flips the recorded
    * field. Enforcement after the flip: the SQL INSERT path gets
    * Spark's own analysis-time nullability checks from the declared V2
    * schema, and the Scala [[append]] path re-checks NOT NULL columns
    * in its constraint pass. Partition columns are immutable like the
    * layout. Returns false when the flag already holds.
    */
  def setColumnNullability(spark: SparkSession, dir: String, name: String,
                           nullable: Boolean): Boolean =
    commit(spark, dir) { old =>
      import org.apache.spark.sql.types.StructType
      val cur = tableSchema(old).getOrElse(throw new IllegalStateException(
        s"ManifestTable at $dir tracks no schema — ALTER has nothing " +
          "to change"))
      val fd = cur.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name does not exist in $dir"))
      require(!old.partitionCols.exists(_.equalsIgnoreCase(name)),
        s"cannot alter nullability of partition column $name")
      if (fd.nullable == nullable) None
      else {
        if (!nullable && old.files.nonEmpty) {
          val n = readFiles(spark, dir, old, old.files)
            .where(org.apache.spark.sql.functions.col(fd.name).isNull)
            .count()
          require(n == 0L,
            s"cannot SET NOT NULL on $name: $n existing row(s) are NULL")
        }
        Some(old.copy(schemaJson = Some(StructType(cur.fields.map(f =>
          if (f eq fd) f.copy(nullable = nullable) else f)).json),
          op = "metadata", cdcPath = None))
      }
    }

  /** ALTER TABLE ... ALTER COLUMN ... COMMENT as one metadata commit —
    * the comment rides the recorded schema's field metadata (the
    * standard Spark slot, so DESCRIBE and the V2 column face surface
    * it); `None` clears. Returns false when nothing changes.
    */
  def setColumnComment(spark: SparkSession, dir: String, name: String,
                       comment: Option[String]): Boolean =
    commit(spark, dir) { old =>
      import org.apache.spark.sql.types.StructType
      val cur = tableSchema(old).getOrElse(throw new IllegalStateException(
        s"ManifestTable at $dir tracks no schema — ALTER has nothing " +
          "to comment"))
      val fd = cur.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name does not exist in $dir"))
      if (fd.getComment() == comment) None
      else {
        val next = comment match {
          case Some(c) => fd.withComment(c)
          case None => fd.copy(metadata =
            new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(fd.metadata).remove("comment").build())
        }
        Some(old.copy(schemaJson = Some(StructType(cur.fields.map(f =>
          if (f eq fd) next else f)).json),
          op = "metadata", cdcPath = None))
      }
    }

  /** ALTER TABLE ... ALTER COLUMN ... SET / DROP DEFAULT as one
    * metadata commit — the default rides the recorded schema's field
    * metadata under Spark's own key (`CURRENT_DEFAULT`), which is
    * where the analyzer's default-column resolution reads it, so
    * INSERTs that omit the column (or write the DEFAULT keyword)
    * substitute it at ANALYSIS time and the stored rows carry real
    * values. SET/DROP DEFAULT is a WRITE-time contract only: rows
    * written while a different (or no) default held keep what they
    * hold, and the `EXISTS_DEFAULT` read-fill an `ADD COLUMN ...
    * DEFAULT` froze (see [[addColumn]]) is deliberately NOT touched
    * here — Delta's two-field protocol, where SET DEFAULT never
    * rewrites history. `None` drops the current default only. Returns
    * false when nothing changes.
    */
  def setColumnDefault(spark: SparkSession, dir: String, name: String,
                       defaultSql: Option[String]): Boolean =
    commit(spark, dir) { old =>
      import org.apache.spark.sql.types.StructType
      val cur = tableSchema(old).getOrElse(throw new IllegalStateException(
        s"ManifestTable at $dir tracks no schema — ALTER has nothing " +
          "to default"))
      val fd = cur.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name does not exist in $dir"))
      val key = "CURRENT_DEFAULT"
      val curDefault =
        if (fd.metadata.contains(key)) Some(fd.metadata.getString(key))
        else None
      if (curDefault == defaultSql) None
      else {
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(fd.metadata)
        val next = fd.copy(metadata = defaultSql match {
          case Some(sql) =>
            // parse now: a default that cannot even parse must fail the
            // ALTER, not every later INSERT
            spark.sessionState.sqlParser.parseExpression(sql)
            mb.putString(key, sql).build()
          case None => mb.remove(key).build()
        })
        Some(old.copy(schemaJson = Some(StructType(cur.fields.map(f =>
          if (f eq fd) next else f)).json),
          op = "metadata", cdcPath = None))
      }
    }

  /** Constraint expressions that reference `col` — rename/drop must not
    * silently break a recorded CHECK (its SQL string holds the old
    * name); the caller rewrites or drops the constraint first.
    */
  private[ext] def constraintsOn(spark: SparkSession, s: Snapshot,
                            col: String): Seq[String] =
    s.constraints.toSeq.collect {
      case (n, e) if spark.sessionState.sqlParser.parseExpression(e)
        .collect { case a: org.apache.spark.sql.catalyst.analysis
          .UnresolvedAttribute => a.nameParts.head }
        .exists(_.equalsIgnoreCase(col)) => n
    }

  /** Generated columns whose generation expression references `col` —
    * rename/drop must not silently break a recorded expression (its
    * SQL holds the old name), the same contract as [[constraintsOn]].
    */
  private[ext] def generatedReferencing(spark: SparkSession, s: Snapshot,
                                        col: String): Seq[String] =
    generatedOf(s).collect {
      case (fd, gen) if spark.sessionState.sqlParser.parseExpression(gen)
        .collect { case a: org.apache.spark.sql.catalyst.analysis
          .UnresolvedAttribute => a.nameParts.head }
        .exists(_.equalsIgnoreCase(col)) => fd.name
    }

  /** ALTER TABLE ... RENAME COLUMN as ONE metadata commit — column
    * mapping (Delta/Iceberg): the logical name changes, the PHYSICAL
    * parquet name stays, so no data file rewrites and every recorded
    * stat, bloom sidecar, NDV sketch and partition value keeps its
    * (physical) key — predicates on the NEW name keep pruning through
    * [[keptFiles]]' logical→physical translation. Time travel below the
    * commit answers with the OLD name (the mapping is versioned state).
    * Partition columns cannot be renamed (the layout is immutable, like
    * the declaration) and neither can columns a CHECK constraint
    * references (its recorded SQL would silently break).
    */
  def renameColumn(spark: SparkSession, dir: String, from: String,
                   to: String): Boolean =
    commit(spark, dir) { old =>
      val cur = tableSchema(old).getOrElse(throw new IllegalStateException(
        s"ManifestTable at $dir tracks no schema — ALTER has nothing " +
          "to rename"))
      val fd = cur.fields.find(_.name.equalsIgnoreCase(from)).getOrElse(
        throw new IllegalArgumentException(
          s"column $from does not exist in $dir"))
      require(!cur.fields.exists(_.name.equalsIgnoreCase(to)),
        s"column $to already exists in $dir")
      require(!old.partitionCols.exists(_.equalsIgnoreCase(from)),
        s"cannot rename partition column $from (the partition layout " +
          "is immutable)")
      val cons = constraintsOn(spark, old, from)
      require(cons.isEmpty,
        s"cannot rename $from: CHECK constraint(s) ${cons.mkString(", ")} " +
          "reference it — drop and re-add them with the new name")
      val gens = generatedReferencing(spark, old, from)
      require(gens.isEmpty,
        s"cannot rename $from: generated column(s) ${gens.mkString(", ")} " +
          "compute from it (the recorded expression holds the old name)")
      val newSchema = org.apache.spark.sql.types.StructType(cur.fields.map(
        f => if (f eq fd) f.copy(name = to) else f))
      val newMap = fullColMap(old, cur).map { case (l, ph) =>
        if (l.equalsIgnoreCase(from)) (to, ph) else (l, ph)
      }
      Some(old.copy(schemaJson = Some(newSchema.json), colMap = newMap,
        op = "metadata", cdcPath = None))
    }

  /** ALTER TABLE ... DROP COLUMN as ONE metadata commit: the logical
    * column disappears (reads stop projecting it — the recorded
    * physical schema no longer selects those bytes), nothing rewrites,
    * and the physical name is RETIRED so a later ADD COLUMN of the same
    * name binds a fresh slot instead of resurrecting the dropped data.
    * Same partition/constraint guards as [[renameColumn]]; the last
    * column cannot be dropped.
    */
  def dropColumn(spark: SparkSession, dir: String, name: String): Boolean =
    commit(spark, dir) { old =>
      val cur = tableSchema(old).getOrElse(throw new IllegalStateException(
        s"ManifestTable at $dir tracks no schema — ALTER has nothing " +
          "to drop"))
      require(cur.fields.exists(_.name.equalsIgnoreCase(name)),
        s"column $name does not exist in $dir")
      require(cur.fields.length > 1,
        s"cannot drop $name: it is the table's only column")
      require(!old.partitionCols.exists(_.equalsIgnoreCase(name)),
        s"cannot drop partition column $name (the partition layout is " +
          "immutable)")
      val cons = constraintsOn(spark, old, name)
      require(cons.isEmpty,
        s"cannot drop $name: CHECK constraint(s) ${cons.mkString(", ")} " +
          "reference it — drop them first")
      val gens = generatedReferencing(spark, old, name)
        .filterNot(_.equalsIgnoreCase(name))
      require(gens.isEmpty,
        s"cannot drop $name: generated column(s) ${gens.mkString(", ")} " +
          "compute from it — drop them first")
      val phys = physName(old, name)
      val newSchema = org.apache.spark.sql.types.StructType(
        cur.fields.filterNot(_.name.equalsIgnoreCase(name)))
      val newMap = fullColMap(old, cur)
        .filterNot(_._1.equalsIgnoreCase(name))
      Some(old.copy(schemaJson = Some(newSchema.json),
        colMap = newMap,
        retiredCols = (old.retiredCols :+ phys).distinct,
        // NDV tracking on the dropped column stops (new files will not
        // carry it); existing per-file sketches age out with rewrites
        ndvCols = old.ndvCols.filterNot(_.equalsIgnoreCase(phys)),
        op = "metadata", cdcPath = None))
    }

  /** Append `df` as batch `batchId`. Returns true if the batch committed,
    * false if an earlier commit already absorbed this `batchId` (the
    * idempotent-replay no-op). `beforeCommit` is a test seam between the
    * (invisible) data-file write and the manifest swap — the crash
    * window whose worst case is orphan files.
    *
    * `partitionBy` on the FIRST append declares the table's partition
    * layout: every data file then holds exactly one partition tuple,
    * the tuple is recorded in the manifest per file, and predicates on
    * the partition columns prune files EXACTLY (point stats) through
    * [[readWhere]] and the planner-integrated [[scan]] — hive-style
    * partition pruning without directories. Later appends inherit the
    * layout automatically (passing a conflicting one raises).
    */
  def append(df0: DataFrame, dir: String, batchId: String,
             beforeCommit: () => Unit = () => (),
             bloomCols: Seq[String] = Nil,
             bloomFpp: Double = 0.01,
             partitionBy: Seq[String] = Nil,
             ndvCols: Seq[String] = Nil): Boolean = {
    // IDENTITY tables wrap the attempt in the standard conflict-rebase
    // loop: a racing append that advanced a mark aborts this one's
    // commit (overlapping minted ranges must never publish), and the
    // retry restages against the fresh mark. Identity-free tables —
    // the overwhelmingly common case — take the attempt directly.
    if (identityOf(snapshot(df0.sparkSession, dir)).isEmpty)
      appendOnce(df0, dir, batchId, beforeCommit, bloomCols, bloomFpp,
        partitionBy, ndvCols)
    else retryOnConflict(df0.sparkSession, dir, batchId, attempts = 5)(
      appendOnce(df0, dir, batchId, beforeCommit, bloomCols, bloomFpp,
        partitionBy, ndvCols))
  }

  private def appendOnce(df0: DataFrame, dir: String, batchId: String,
             beforeCommit: () => Unit,
             bloomCols: Seq[String],
             bloomFpp: Double,
             partitionBy: Seq[String],
             ndvCols: Seq[String]): Boolean = {
    val spark = df0.sparkSession
    val f = fs(spark, dir)
    val snap0 = snapshot(spark, dir)
    if (snap0.batchIds.contains(batchId)) return false
    // IDENTITY columns mint first (a generation expression may read
    // them), then GENERATED ALWAYS AS columns compute: omitted →
    // computed, NULL slots → computed, explicit non-null values
    // validated by the synthetic <=> check riding the constraint pass
    val (dfId, idAdv) = fillIdentity(snap0, df0)
    val df = fillGenerated(snap0, dfId)
    // fail a type-conflicting batch BEFORE writing its data files (the
    // commit callback re-merges against the CAS-fresh head anyway)
    mergedSchemaJson(snap0, df.schema)
    // and a constraint-violating one (one aggregate pass, all
    // constraints at once; free when the table has none). NOT NULL
    // columns ride the same pass as synthetic checks — the Scala path's
    // half of the nullability contract (SQL INSERTs get Spark's own
    // analysis-time enforcement from the declared schema). A batch that
    // OMITS a NOT NULL column entirely is refused — reads would
    // null-fill it, the exact silent lie the declaration forbids
    tableSchema(snap0).foreach { sc =>
      val omitted = sc.fields.filter(fd => !fd.nullable &&
        !df.columns.exists(_.equalsIgnoreCase(fd.name)))
      require(omitted.isEmpty,
        s"append batch $batchId omits NOT NULL column(s) " +
          s"${omitted.map(_.name).mkString(", ")} — reads would " +
          "null-fill them; supply the column or DROP NOT NULL first")
    }
    enforceConstraints(df, withNotNull(snap0, df, snap0.constraints),
      s"append batch $batchId")
    val layout = resolveLayout(snap0, df.schema, partitionBy)
    val stage = s"$dir/_stage/${java.util.UUID.randomUUID()}"
    // data files bind by PHYSICAL names (partition columns cannot be
    // renamed, so `layout` needs no translation)
    stageWrite(toPhysical(snap0, df), stage, layout)
    val (moved, sizes, pvals) =
      moveToData(f, dir, stage, partFamilies(df.schema, layout))
    val stats = footerStats(spark, dir, moved)
    // a file the footer PROVES empty (0 rows) is dropped before the
    // commit — a fully-deduplicated batch otherwise litters the manifest
    // with unprunable empty segments; its batch id still commits, so
    // replay idempotence is unaffected
    val live = dropEmpty(f, dir, moved, stats)
    buildBlooms(spark, dir, live, bloomCols.map(physName(snap0, _)),
      stats, bloomFpp)
    // NDV tracking: declared on the first append (like partitionBy),
    // inherited by every later one; each batch pays one O(batch) pass.
    // Recorded (like every sidecar/stat key) under PHYSICAL names, so a
    // later rename costs the sketches nothing
    val tracked =
      if (snap0.ndvCols.nonEmpty) {
        require(ndvCols.isEmpty ||
          ndvCols.map(c => physName(snap0, c).toLowerCase) == snap0.ndvCols,
          s"table already tracks NDV on (${snap0.ndvCols.mkString(", ")})")
        snap0.ndvCols
      } else ndvCols.map(c => physName(snap0, c).toLowerCase)
    val ndvMap = buildNdv(spark, dir, live, tracked)
    val idMarks = identityMarks(spark, dir, snap0, live, stats, idAdv)
    beforeCommit()
    if (idAdv.nonEmpty) opConflicted.set(false) // terminal decision
    commit(spark, dir) { old =>
      if (old.batchIds.contains(batchId)) None // lost the race to a replay
      // IDENTITY race: another append advanced a mark after this one
      // staged — committing would publish an overlapping minted range;
      // signal a conflict so the identity retry loop rebases
      else if (idAdv.exists(a => old.properties.get(a.key) != a.prevProp)) {
        opConflicted.set(true); None
      }
      else {
        // the layout was resolved against snap0; a racing creation that
        // declared a DIFFERENT layout makes this staged data wrong —
        // raise rather than commit a mixed table
        require(old.partitionCols.map(_.toLowerCase) ==
          snap0.partitionCols.map(_.toLowerCase),
          s"concurrent commit changed the partition layout of $dir")
        // the staged files bound PHYSICAL names via snap0's mapping; a
        // concurrent RENAME/DROP COLUMN would land them under stale
        // (possibly newly-retired) slots — raise like the layout race
        require(old.colMap == snap0.colMap &&
          old.retiredCols == snap0.retiredCols,
          s"concurrent commit changed the column mapping of $dir")
        Some(old.copy(files = old.files ++ live,
          batchIds = old.batchIds + batchId, stats = old.stats ++ stats,
          sizes = old.sizes ++ sizes.filter(kv => live.contains(kv._1)),
          pvals = old.pvals ++ pvals.filter(kv => live.contains(kv._1)),
          partitionCols = if (layout.nonEmpty) layout else old.partitionCols,
          ndvCols = if (tracked.nonEmpty) tracked else old.ndvCols,
          ndv = old.ndv ++ ndvMap.view.filterKeys(live.toSet).toMap,
          properties = old.properties ++ idMarks,
          op = "append", schemaJson = mergedSchemaJson(old, df.schema),
          cdcPath = None))
      }
    }
  }

  /** The duplicated-column prefix a PARTITIONED stage write uses as its
    * hive directory key (see [[stageWrite]]). Never lands in data file
    * bytes — `partitionBy` consumes it into the path.
    */
  private[ext] val PartPrefix = "_gp_"

  /** Stage `df` for a table partitioned on `partCols` (flat parquet when
    * empty). Spark's `partitionBy` strips its key columns from the file
    * bytes, which would break every flat read of `data/` — so the write
    * partitions on a DUPLICATED copy of each column instead: the copy
    * becomes the `_gp_<col>=<value>` directory (consumed by the layout,
    * decoded into manifest `pv:` lines by [[moveToData]]), the original
    * column stays physically in every file. Result: each data file holds
    * exactly ONE partition tuple, and all read paths (plain, DV-applied,
    * feeds, time travel) keep working unchanged on the flat directory.
    */
  /** OPTIMIZED WRITE (guide §6 — small files hurt twice; coalesce on
    * write with a REBALANCE): every staged write otherwise emits one
    * file per input partition, so a small batch flowing through a
    * 32-way session writes 32 tiny files — and a lang-partitioned one
    * writes 32 × (#langs) — each paying a footer read, a rename, a
    * manifest line and bloom/NDV work per commit, and a per-file open
    * on every later read. The AQE rebalance sizes output partitions to
    * `spark.sql.adaptive.advisoryPartitionSizeInBytes` at RUNTIME (not
    * from estimates): a tiny batch collapses to one right-sized file,
    * a 100 TB write splits into advisory-sized files — the same
    * optimized-write shuffle Delta/Iceberg use for file sizing, scale-
    * adaptive by construction. Partitioned writes rebalance ON the
    * partition columns so each task holds whole partition values and
    * `partitionBy` emits one file per value per task instead of one
    * per value per input partition. `graft.write.rebalance=false`
    * restores the raw pass-through (e.g. when an upstream layout must
    * be preserved exactly).
    */
  private def rebalanced(df: DataFrame, partCols: Seq[String],
                         sized: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.col
    val on = df.sparkSession.conf
      .getOption("graft.write.rebalance").forall(_.toBoolean)
    if (!on || sized || callerSized(df.queryExecution.logical)) df
    else if (partCols.isEmpty) df.hint("rebalance")
    else df.hint("rebalance", partCols.map(col): _*)
  }

  /** True when the staged frame already carries a DELIBERATE output
    * layout the rebalance must not override: a `coalesce(n)` (an
    * explicit file-count directive), a keyed/range repartition or an
    * earlier rebalance, reachable from the root through partitioning-
    * preserving narrow ops (Project/Filter/partition-local Sort). A
    * plain round-robin `repartition(n)` is NOT layout intent — it is
    * the parallelism aid [[graft.Tables.spread]]-style readers inject,
    * and letting it through is exactly the 32-tiny-files problem the
    * rebalance exists to fix.
    */
  private def callerSized(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
  : Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    plan match {
      case p: Project => callerSized(p.child)
      case f: Filter => callerSized(f.child)
      case s: Sort if !s.global => callerSized(s.child)
      case a: SubqueryAlias => callerSized(a.child)
      case r: Repartition => !r.shuffle // coalesce(n): explicit sizing
      case _: RepartitionByExpression => true
      case _: RebalancePartitions => true
      case _ => false
    }
  }

  /** `sized = true` marks a caller that already computed its own output
    * partitioning for file sizing (the maintenance rewrites: compact /
    * compactSmall size to `targetFileBytes`; purgeDeletes is
    * contractually zero-shuffle) — the rebalance must not override it.
    */
  private[ext] def stageWrite(df: DataFrame, stage: String,
                         partCols: Seq[String],
                         sized: Boolean = false): Unit =
    if (partCols.isEmpty) rebalanced(df, Nil, sized).write.parquet(stage)
    else {
      import org.apache.spark.sql.functions.{col, concat, lit, when}
      // the directory key is "v" + canonical value, null kept null:
      // Spark's path writer sends BOTH null and '' to
      // __HIVE_DEFAULT_PARTITION__, so a raw duplicate would conflate
      // them and the "exact" point stats would prove `c = ''` matches
      // nothing — silently dropping rows. The prefix keeps every
      // non-null value (including '') out of the null directory;
      // [[moveToData]] strips it back off.
      val dup = partCols.foldLeft(rebalanced(df, partCols, sized))((d, c) =>
        d.withColumn(PartPrefix + c,
          when(col(c).isNull, lit(null: String))
            .otherwise(concat(lit(PartValueTag), col(c).cast("string")))))
      dup.write.partitionBy(partCols.map(PartPrefix + _): _*).parquet(stage)
    }

  /** Prefix on every non-null `_gp_` directory value (see [[stageWrite]]).
    * Exists only in the transient stage path, never in manifests or data.
    */
  private[ext] val PartValueTag = "v"

  /** Canonical-family map (the [[Skipping]] vocabulary) for the table's
    * partition columns, from the written frame's schema — what
    * [[moveToData]] stamps into each file's [[PartValue]]s. Declaration
    * already restricted the columns to these types.
    */
  private[ext] def partFamilies(schema: org.apache.spark.sql.types.StructType,
                           partCols: Seq[String]): Map[String, String] = {
    import org.apache.spark.sql.types._
    partCols.flatMap { c =>
      schema.fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          c.toLowerCase -> "long"
        case BooleanType => c.toLowerCase -> "bool"
        case DateType => c.toLowerCase -> "date"
        case _ => c.toLowerCase -> "string"
      })
    }.toMap
  }

  /** Move every staged parquet file into `data/` under a fresh UUID
    * name, returning the names, each file's byte length (captured here —
    * rename preserves it — so the manifest can record sizes without a
    * later RPC per file), and each file's partition values decoded from
    * the hive-style `_gp_<col>=<value>` directories a partitioned
    * [[stageWrite]] produced (empty map per file on flat stages).
    */
  private[ext] def moveToData(f: org.apache.hadoop.fs.FileSystem, dir: String,
                         stage: String,
                         partFams: Map[String, String] = Map.empty)
  : (Seq[String], Map[String, Long], Map[String, Map[String, PartValue]]) = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    def walk(at: org.apache.hadoop.fs.Path, pv: Map[String, PartValue])
    : Seq[(org.apache.hadoop.fs.FileStatus, Map[String, PartValue])] =
      f.listStatus(at).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (st.isDirectory) {
          val eq = name.indexOf('=')
          if (name.startsWith(PartPrefix) && eq > 0) {
            val c = ExternalCatalogUtils.unescapePathName(
              name.substring(0, eq)).stripPrefix(PartPrefix).toLowerCase
            val raw = name.substring(eq + 1)
            // only a true null reaches the hive default directory —
            // [[stageWrite]] tags every non-null value (so '' becomes
            // the bare tag, distinct from null); strip the tag back off
            val v =
              if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) None
              else {
                val dec0 = ExternalCatalogUtils.unescapePathName(raw)
                require(dec0.startsWith(PartValueTag),
                  s"staged partition directory $name lacks the " +
                    s"'$PartValueTag' value tag — not a graft stage")
                val s0 = dec0.substring(PartValueTag.length)
                // DATE partitions: the directory carries the cast
                // string ('2024-03-05'); the skipping evaluator's date
                // family compares DAYS since epoch — canonicalize here
                Some(if (partFams.get(c).contains("date"))
                  java.time.LocalDate.parse(s0).toEpochDay.toString
                else s0)
              }
            walk(st.getPath,
              pv + (c -> PartValue(partFams.getOrElse(c, "string"), v)))
          } else walk(st.getPath, pv)
        } else if (st.isFile && name.endsWith(".parquet")) Seq((st, pv))
        else Nil
      }
    val moved = walk(p(stage), Map.empty).map { case (st, pv) =>
      val name = s"${java.util.UUID.randomUUID()}.parquet"
      f.mkdirs(p(dataDir(dir)))
      require(f.rename(st.getPath, p(s"${dataDir(dir)}/$name")),
        s"move to data/ failed for ${st.getPath}")
      (name, st.getLen, pv)
    }
    f.delete(p(stage), true)
    (moved.map(_._1), moved.map(m => m._1 -> m._2).toMap,
      moved.collect { case (n, _, pv) if pv.nonEmpty => n -> pv }.toMap)
  }

  /** Delete and drop the files whose footer stats prove zero rows;
    * files WITHOUT stats (unreadable footer) are conservatively kept.
    */
  private[ext] def dropEmpty(f: org.apache.hadoop.fs.FileSystem, dir: String,
                        names: Seq[String],
                        stats: Map[String, FileStats]): Seq[String] = {
    val (empty, live) = names.partition(n => stats.get(n).exists(_.rows == 0L))
    empty.foreach(n => f.delete(p(s"${dataDir(dir)}/$n"), false))
    live
  }

  private[ext] def cdcDir(dir: String) = s"$dir/_cdc"
  private[ext] def dvDir(dir: String) = s"$dir/_dv"

  // ---------------------------------------------- constraints
  //
  // Named CHECK expressions recorded in the manifest and enforced on
  // every path that introduces or changes rows (append, merge, the
  // updates). SQL CHECK semantics: a row fails only when the expression
  // is FALSE (NULL passes — express NOT NULL as `col IS NOT NULL`).
  // A training-corpus table that silently absorbs null text is a
  // pipeline bug factory; the table layer refuses, loudly, with counts.

  /** The violating-rows condition for a CHECK expression. */
  private[ext] def violates(exprSql: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    not(coalesce(expr(exprSql), lit(true)))
  }

  /** One aggregate pass over `df` counting violations of EVERY
    * constraint at once; raises naming each violated constraint with
    * its row count. Tables without constraints pay nothing.
    */
  private[ext] def enforceConstraints(df: DataFrame,
                                 cons: Map[String, String],
                                 what: String): Unit = {
    import org.apache.spark.sql.functions.{lit, sum, when}
    if (cons.isEmpty) return
    val ordered = cons.toSeq.sortBy(_._1)
    val aggs = ordered.map { case (n, e) =>
      sum(when(violates(e), 1L).otherwise(0L)).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val bad = ordered.zipWithIndex.flatMap { case ((n, e), i) =>
      val c = if (row.isNullAt(i)) 0L else row.getLong(i)
      if (c > 0L) Some(s"$n [$e]: $c row(s)") else None
    }
    require(bad.isEmpty,
      s"$what violates CHECK constraint(s): ${bad.mkString("; ")}")
  }

  /** `cons` plus a synthetic `IS NOT NULL` check per NON-NULLABLE
    * schema column present in `df` — NOT NULL is enforced in the same
    * one-aggregate pass as the CHECK constraints at every seam that
    * can introduce a NULL (append, update SET, merge SET/INSERT,
    * overwrite). Columns the frame doesn't carry are the CALLER's
    * omission problem (append raises on them; row-op frames always
    * project the full schema).
    */
  private[ext] def withNotNull(snap: Snapshot, df: DataFrame,
                               cons: Map[String, String])
  : Map[String, String] =
    cons ++ tableSchema(snap).map(_.fields.toSeq
      .filter(fd => !fd.nullable &&
        df.columns.exists(_.equalsIgnoreCase(fd.name)))
      // backtick-quoted (embedded backticks doubled): a column name
      // needing quoting (spaces, dots — possible via the DataFrame
      // path) must still parse as ONE identifier, not brick every
      // later append/UPDATE/MERGE with a parse error
      .map(fd => s"graft.notnull.${fd.name}" ->
        s"`${fd.name.replace("`", "``")}` IS NOT NULL")
      .toMap).getOrElse(Map.empty) ++
      // GENERATED ALWAYS AS columns validate on the same pass: after
      // [[fillGenerated]] the equality is an invariant, so this only
      // fires on an EXPLICIT wrong value (never a silent correction)
      generatedOf(snap)
        .filter(g => df.columns.exists(_.equalsIgnoreCase(g._1.name)))
        .map { case (fd, gen) =>
          s"graft.generated.${fd.name}" ->
            (s"`${fd.name.replace("`", "``")}` <=> " +
              s"(CAST(($gen) AS ${fd.dataType.sql}))")
        }.toMap

  // ---------------------------------------------- generated columns
  //
  // `GENERATED ALWAYS AS (expr)` — the third column-metadata write
  // contract next to DEFAULTs and CHECKs. The expression rides the
  // recorded schema's field metadata under Spark's own key
  // (GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY — the catalog
  // declares SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS, so Spark
  // validates it at CREATE: deterministic, references only
  // non-generated columns). Write-side contract, enforced at every
  // row-introducing or row-changing seam:
  //
  //   - a batch that OMITS the column computes it; a NULL slot in a
  //     provided column computes too (generation fills absence, and a
  //     NULL is absence per row — the one DOCUMENTED divergence from
  //     Delta, which rejects explicit NULLs; the full-width V1 write
  //     path cannot tell an omitted column from a null-filled one);
  //   - an explicit NON-NULL value must equal the expression — the
  //     synthetic `<=>` check above raises otherwise, same one
  //     aggregate as the CHECK/NOT NULL pass, never a silent fix;
  //   - UPDATE/MERGE may not assign the column; instead every update
  //     projection RECOMPUTES it — the stored invariant (c <=> expr
  //     holds for every committed row) makes recomputation identity on
  //     pass-through rows and exactly the dependency refresh on
  //     changed ones.

  /** The table's generated columns with their generation expressions. */
  private[ext] def generatedOf(snap: Snapshot)
  : Seq[(org.apache.spark.sql.types.StructField, String)] =
    tableSchema(snap).map(_.fields.toSeq.flatMap(fd =>
      org.apache.spark.sql.catalyst.util.GeneratedColumn
        .getGenerationExpression(fd).map(fd -> _))).getOrElse(Nil)

  /** Table property pinning the session timezone generated-column
    * values are computed in. Recorded at CREATE/REPLACE time for any
    * table declaring generated columns; [[withGeneratedDerived]] only
    * evaluates TIMEZONE-SENSITIVE derivations (timestamp→date casts,
    * trunc, from_unixtime, ...) when the reading session's timezone
    * matches the pin, and [[fillGenerated]]/[[recomputeGenerated]]
    * refuse a timezone-sensitive write from a differing session —
    * otherwise a reader in another zone derives a day bound shifted by
    * one day and the one-sided evaluator prunes files that contain
    * matching rows (ADVICE r20 #4: wrong results, not just a missed
    * optimization).
    */
  private[graft] val GeneratedTzKey = "graft.generated.timeZone"

  /** True when evaluating `e` depends on the session timezone. Casts
    * consult [[Cast.needsTimeZone]] (a Cast node is always
    * timezone-aware but usually doesn't use it); any other
    * timezone-aware expression counts conservatively.
    */
  private[ext] def tzSensitiveTree(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, TimeZoneAwareExpression}
    e.exists {
      case c: Cast => Cast.needsTimeZone(c.child.dataType, c.dataType)
      case _: TimeZoneAwareExpression => true
      case _ => false
    }
  }

  /** The analyzed tree of generation expression `genSql` (cast to the
    * generated column's type) resolved over the table schema — None
    * when it fails to parse/resolve (callers treat that
    * conservatively).
    */
  private[ext] def analyzedGen(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      fd: org.apache.spark.sql.types.StructField, genSql: String)
  : Option[org.apache.spark.sql.catalyst.expressions.Expression] =
    try {
      import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast}
      import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
      val attrs = schema.fields.toIndexedSeq.map(f =>
        AttributeReference(f.name, f.dataType, f.nullable)())
      val proj = Project(
        Seq(Alias(Cast(
          spark.sessionState.sqlParser.parseExpression(genSql),
          fd.dataType), "__g")()),
        LocalRelation(attrs))
      spark.sessionState.analyzer.execute(proj).collectFirst {
        case p: Project => p.projectList.head
          .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Alias]
          .child
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Refuse a generated-column WRITE whose session timezone differs
    * from the table's pin when any generation expression is
    * timezone-sensitive — the stored values would silently disagree
    * with everything already committed (and with the derivation
    * [[withGeneratedDerived]] serves readers). Non-sensitive
    * expressions (arithmetic, substrings, date-typed trunc) write from
    * any zone. Unresolvable expressions count sensitive — one-sided.
    */
  private[ext] def requireGeneratedTz(spark: SparkSession,
                                      snap: Snapshot): Unit = {
    val gens = generatedOf(snap)
    if (gens.isEmpty) return
    val rec = snap.properties.get(GeneratedTzKey)
    if (rec.isEmpty) return // pre-pin table: derivation never fires either
    val cur = spark.sessionState.conf.sessionLocalTimeZone
    if (rec.contains(cur)) return
    val schema = tableSchema(snap).getOrElse(return)
    val sensitive = gens.exists { case (fd, gen) =>
      analyzedGen(spark, schema, fd, gen).forall(tzSensitiveTree) }
    require(!sensitive,
      s"this write runs in session timezone $cur but the table's " +
        s"generated columns are pinned to ${rec.get} — their values " +
        "depend on the session timezone, so writing from another zone " +
        "would disagree with committed data; set " +
        s"spark.sql.session.timeZone=${rec.get} for this write")
  }

  /** Fill generated columns on a ROW-INTRODUCING frame: absent columns
    * compute whole, NULL slots of provided columns compute per row.
    */
  private[ext] def fillGenerated(snap: Snapshot, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, when}
    requireGeneratedTz(df.sparkSession, snap)
    generatedOf(snap).foldLeft(df) { case (acc, (fd, gen)) =>
      if (!acc.columns.exists(_.equalsIgnoreCase(fd.name)))
        acc.withColumn(fd.name, expr(gen).cast(fd.dataType))
      else acc.withColumn(fd.name,
        when(col(fd.name).isNull, expr(gen).cast(fd.dataType))
          .otherwise(col(fd.name)))
    }
  }

  /** Recompute generated columns on an UPDATED full-width frame —
    * identity on rows whose dependencies did not change (the stored
    * invariant), the refresh on rows whose dependencies did.
    */
  private[ext] def recomputeGenerated(snap: Snapshot,
                                      df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    requireGeneratedTz(df.sparkSession, snap)
    generatedOf(snap).foldLeft(df) { case (acc, (fd, gen)) =>
      acc.withColumn(fd.name, expr(gen).cast(fd.dataType))
    }
  }

  /** Loud rejection of a SET list naming a generated or identity
    * column — neither is assignable (generated recomputes from its
    * sources; identity values are minted by the append path).
    */
  private[ext] def rejectGeneratedAssign(snap: Snapshot,
                                         cols: Iterable[String],
                                         what: String): Unit = {
    val gen = generatedOf(snap).map(_._1.name.toLowerCase).toSet
    cols.find(c => gen.contains(c.toLowerCase)).foreach(c =>
      throw new UnsupportedOperationException(
        s"$what assigns column $c, which is GENERATED ALWAYS AS — " +
          "generated columns cannot be assigned; they recompute when " +
          "their source columns change"))
    val ids = identityOf(snap).map(_._1.name.toLowerCase).toSet
    cols.find(c => ids.contains(c.toLowerCase)).foreach(c =>
      throw new UnsupportedOperationException(
        s"$what assigns column $c, which is GENERATED AS IDENTITY — " +
          "identity values are minted by the append/INSERT path"))
  }

  // ---------------------------------------------- identity columns
  //
  // `GENERATED { ALWAYS | BY DEFAULT } AS IDENTITY` — transactional
  // value minting without a coordinator. The spec (start/step/
  // allowExplicitInsert) rides the recorded schema's field metadata
  // under Spark's own keys; the HIGH-WATER MARK is a table property
  // (`graft.identity.hwm.<physCol>` = the next value to mint), so it
  // versions and time-travels with everything else. RESTORE keeps the
  // CURRENT mark (restore carries old.properties): the mark is
  // monotonic forever, because rewinding it could re-mint values that
  // rows in still-travelable history already carry. An
  // append that mints values reads the HWM, stamps DENSE per-batch
  // positions (RDD zipWithIndex — no sort, no single-partition
  // window), and its commit callback REFUSES if a concurrent append
  // moved the mark (the standard conflict signal; the append retries
  // against the fresh head, restaging with the new base) — two racing
  // INSERTs can never mint overlapping ranges. Values are unique and
  // monotonic per the step sign; gaps appear only across retried/
  // explicit batches (the Delta identity contract — gaps are allowed,
  // overlaps never).

  /** The table's identity columns with their specs. */
  private[ext] def identityOf(snap: Snapshot)
  : Seq[(org.apache.spark.sql.types.StructField,
      org.apache.spark.sql.connector.catalog.IdentityColumnSpec)] =
    tableSchema(snap).map(_.fields.toSeq.flatMap(fd =>
      org.apache.spark.sql.catalyst.util.IdentityColumn
        .getIdentityInfo(fd).map(fd -> _))).getOrElse(Nil)

  /** The HWM property key for an identity column. */
  private[ext] def identityHwmKey(col: String): String =
    s"graft.identity.hwm.${col.toLowerCase}"

  /** The next value to mint for an identity column at `snap`. The mark
    * is keyed by the column's PHYSICAL name — like every stat and
    * sidecar — so a RENAME cannot orphan it (a logically-keyed mark
    * would fall back to the declared start and re-mint a published
    * range).
    */
  private[ext] def identityBase(snap: Snapshot,
      fd: org.apache.spark.sql.types.StructField,
      spec: org.apache.spark.sql.connector.catalog.IdentityColumnSpec): Long =
    snap.properties.get(identityHwmKey(physName(snap, fd.name)))
      .map(_.toLong).getOrElse(spec.getStart)

  /** `df` with a DENSE 0-based batch position appended — RDD
    * zipWithIndex on the frame's own partitioning (one count job, no
    * sort, no single-partition funnel). Positions are stable for the
    * single staging materialization that consumes them; they carry no
    * cross-run meaning (identity values promise uniqueness, not a
    * particular assignment — Delta's contract).
    */
  private def zipDense(df: DataFrame, posCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, df.schema
      .add(posCol, org.apache.spark.sql.types.LongType, nullable = false))
  }

  /** One identity column's pending mark advance: the commit refuses if
    * `prevProp` (the HWM property as of the staging snapshot) moved —
    * the signal the append's retry loop rebases on.
    */
  private[ext] final case class IdentityAdvance(
      key: String, prevProp: Option[String], col: String, step: Long)

  /** Mint identity values for an append batch. Explicit non-null
    * values require `allowExplicitInsert` (GENERATED BY DEFAULT);
    * GENERATED ALWAYS refuses them loudly. NULL slots and absent
    * columns mint `base + step * densePos`. The new mark is taken
    * AFTER staging from the staged files' own footer stats (the
    * max/min of the column clears minted and explicit values alike),
    * so no extra pass over the batch ever runs.
    */
  private[ext] def fillIdentity(snap: Snapshot, df0: DataFrame)
  : (DataFrame, Seq[IdentityAdvance]) = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val ids = identityOf(snap)
    if (ids.isEmpty) return (df0, Nil)
    val pos = "__graft_idpos"
    var df = zipDense(df0, pos)
    val advances = ids.map { case (fd, spec) =>
      val has = df0.columns.exists(_.equalsIgnoreCase(fd.name))
      if (has && !spec.isAllowExplicitInsert)
        require(df0.where(col(fd.name).isNotNull).isEmpty,
          s"column ${fd.name} is GENERATED ALWAYS AS IDENTITY — " +
            "explicit values are not accepted; omit the column " +
            "(or declare it GENERATED BY DEFAULT)")
      val base = identityBase(snap, fd, spec)
      val minted = lit(base) + lit(spec.getStep) * col(pos)
      df = df.withColumn(fd.name,
        if (has) coalesce(col(fd.name).cast(fd.dataType),
          minted.cast(fd.dataType))
        else minted.cast(fd.dataType))
      val key = identityHwmKey(physName(snap, fd.name))
      IdentityAdvance(key, snap.properties.get(key), fd.name, spec.getStep)
    }
    (df.drop(pos), advances)
  }

  /** The post-staging mark values: per advance, the staged files'
    * footer max (min for a negative step) of the column, plus one
    * step. None when the batch staged no rows (mark unchanged). Falls
    * back to one aggregate over the staged files if any footer lacks
    * the column's stats — the mark may never under-advance.
    */
  private[ext] def identityMarks(spark: SparkSession, dir: String,
                                 snap: Snapshot, moved: Seq[String],
                                 stats: Map[String, FileStats],
                                 advances: Seq[IdentityAdvance])
  : Seq[(String, String)] =
    if (advances.isEmpty || moved.isEmpty) Nil
    else advances.map { adv =>
      val phys = physName(snap, adv.col)
      val key = phys.toLowerCase
      val vals: Seq[Long] =
        if (moved.forall(f => stats.get(f).exists(_.cols.contains(key))))
          moved.flatMap { f =>
            val cs = stats(f).cols(key)
            (if (adv.step >= 0) cs.max else cs.min).map(_.toLong)
          }
        else {
          import org.apache.spark.sql.functions.{col, max, min}
          val agg = if (adv.step >= 0) max(col(phys)) else min(col(phys))
          val r = plainRead(spark, dir, snap, moved).agg(agg).head()
          if (r.isNullAt(0)) Nil else Seq(r.getLong(0))
        }
      // CLAMPED in the step direction: a GENERATED BY DEFAULT insert
      // carrying only explicit values BEHIND the mark (the backfill of
      // id=5 after minting 1..100) must not rewind it — the next
      // minting append would re-mint already-published ids, violating
      // the "overlaps never / mark is monotonic forever" contract.
      // Explicit values only ever ADVANCE the mark.
      val mark =
        if (vals.isEmpty) adv.prevProp.map(_.toLong)
        else {
          val cand = (if (adv.step >= 0) vals.max else vals.min) + adv.step
          Some(adv.prevProp.map(_.toLong).fold(cand)(p =>
            if (adv.step >= 0) math.max(cand, p) else math.min(cand, p)))
        }
      adv.key -> mark.map(_.toString).getOrElse("")
    }.filter(_._2.nonEmpty)

  /** Record CHECK constraint `name` = `exprSql`. EXISTING rows are
    * validated first (inside the commit callback, so a CAS retry
    * re-validates against rows a racing append just landed — a
    * constraint can never commit over data that violates it). Returns
    * false when the identical constraint is already present. The commit
    * is op `metadata`: the feeds skip it, like a compaction.
    */
  def addConstraint(spark: SparkSession, dir: String, name: String,
                    exprSql: String): Boolean = {
    require(name.nonEmpty && !name.contains("\t"),
      "constraint names must be non-empty and tab-free")
    spark.sessionState.sqlParser.parseExpression(exprSql) // parse early
    commit(spark, dir) { old =>
      if (old.constraints.get(name).contains(exprSql)) None
      else {
        if (old.files.nonEmpty) {
          val n = readFiles(spark, dir, old, old.files)
            .where(violates(exprSql)).count()
          require(n == 0L,
            s"cannot add CHECK constraint $name [$exprSql]: " +
              s"$n existing row(s) violate it")
        }
        Some(old.copy(constraints = old.constraints + (name -> exprSql),
          op = "metadata", cdcPath = None))
      }
    }
  }

  /** Drop constraint `name`; false if it does not exist. */
  def dropConstraint(spark: SparkSession, dir: String,
                     name: String): Boolean =
    commit(spark, dir) { old =>
      if (!old.constraints.contains(name)) None
      else Some(old.copy(constraints = old.constraints - name,
        op = "metadata", cdcPath = None))
    }

  /** The CHANGE-FEED toggle: with this property `true`, the SQL faces'
    * row-level verbs (DELETE / UPDATE / MERGE) record their CDC
    * sidecars, so `readChangeFeed` spans SQL mutations — Delta's
    * `enableChangeDataFeed` idiom. Scala callers pass `cdc` explicitly;
    * the property is how a declarative surface opts a TABLE in.
    */
  val ChangeFeedProperty = "graft.enableChangeFeed"

  /** True when [[ChangeFeedProperty]] is set `true` on the snapshot. */
  def changeFeedEnabled(snap: Snapshot): Boolean =
    snap.properties.get(ChangeFeedProperty).exists(_.equalsIgnoreCase("true"))

  /** TAGS are properties under this prefix (`graft.tag.<name> = <v>`) —
    * Iceberg's named-ref idiom reduced to the property machinery the
    * manifest already has: one metadata commit to create or drop, and
    * `VERSION AS OF '<name>'` on the SQL catalog resolves through them.
    * [[expireLog]] and [[vacuum]] treat tagged versions as LIVE, so a
    * tag pins its snapshot — log entries and data files — past any
    * retention setting until the tag is dropped.
    */
  val TagPropertyPrefix = "graft.tag."

  /** The snapshot's tags: name → pinned version. */
  def tags(snap: Snapshot): Map[String, Long] =
    snap.properties.collect {
      case (k, v) if k.startsWith(TagPropertyPrefix) =>
        k.stripPrefix(TagPropertyPrefix) -> v.toLong
    }

  /** Name `tag` → `version` (head when None). One metadata commit;
    * re-tagging an existing name to a new version is a loud error
    * (drop it first — a silently moved tag breaks whoever pinned it).
    */
  def createTag(spark: SparkSession, dir: String, tag: String,
                version: Option[Long] = None): Long = {
    require(tag.nonEmpty && !tag.contains("\t"),
      "tag names must be non-empty and tab-free")
    val snap = snapshot(spark, dir)
    val v = version.getOrElse(snap.version)
    require(v >= 1L && v <= snap.version,
      s"cannot tag version $v of $dir (head is ${snap.version})")
    val existing = tags(snap).get(tag)
    require(existing.forall(_ == v),
      s"tag '$tag' already names version ${existing.get}; drop it first")
    if (existing.isEmpty)
      setProperties(spark, dir, Map(s"$TagPropertyPrefix$tag" -> v.toString))
    v
  }

  /** Drop tag `tag`; false if it does not exist. */
  def dropTag(spark: SparkSession, dir: String, tag: String): Boolean =
    unsetProperties(spark, dir, Seq(s"$TagPropertyPrefix$tag"))

  /** Set (upsert) table properties — one metadata-only commit, no data
    * I/O, feed-invisible (a property change moves no rows). False when
    * every pair is already present.
    */
  def setProperties(spark: SparkSession, dir: String,
                    props: Map[String, String]): Boolean = {
    require(props.nonEmpty, "setProperties needs at least one property")
    commit(spark, dir) { old =>
      if (props.forall { case (k, v) => old.properties.get(k).contains(v) })
        None
      else Some(old.copy(properties = old.properties ++ props,
        op = "metadata", cdcPath = None))
    }
  }

  /** Unset table properties; false when none of the keys is present. */
  def unsetProperties(spark: SparkSession, dir: String,
                      keys: Seq[String]): Boolean = {
    require(keys.nonEmpty, "unsetProperties needs at least one key")
    commit(spark, dir) { old =>
      if (!keys.exists(old.properties.contains)) None
      else Some(old.copy(properties = old.properties -- keys,
        op = "metadata", cdcPath = None))
    }
  }

  /** `count(*)` answered ENTIRELY from manifest metadata — footer row
    * counts minus deletion-vector position counts, zero data-file I/O —
    * or None when any live file lacks footer stats (a partial sum would
    * read as a total; the caller then runs the real count). The same
    * one-sided honesty as skipping: metadata answers only what it can
    * PROVE. `asOf` counts a pinned historical version.
    */
  def metaCount(spark: SparkSession, dir: String,
                asOf: Option[Long] = None): Option[Long] = {
    val s = asOf.fold(snapshot(spark, dir))(snapshotAt(spark, dir, _))
    if (!s.files.forall(s.stats.contains)) None
    else Some(s.files.map(f => s.stats(f).rows).sum -
      s.dvs.valuesIterator.flatten.map(_.rows).sum)
  }

  /** `min(col)`/`max(col)` answered ENTIRELY from manifest ColStats —
    * zero data-file I/O — with the same one-sided honesty as
    * [[metaCount]]: Some only when the answer is PROVABLE, i.e.
    *
    *   - the table tracks a schema and the column's type is integral,
    *     double/float, string or boolean (date/timestamp columns share
    *     the long stats family — a long answer would be the wrong type,
    *     so they fall back);
    *   - EVERY live file carries usable footer stats for the column (a
    *     single stats-less file could hide the true extremum);
    *   - NO live file carries a deletion vector (a deleted row may BE
    *     the extremum — the file min/max describes pre-delete bytes).
    *
    * The inner options mirror SQL MIN/MAX null semantics: a table whose
    * column is entirely null answers Some((None, None)). Values decode
    * from the canonical stats family: Long, Double, String or Boolean
    * (cast to the column's exact width at the call site if needed).
    * `asOf` answers against a pinned historical version.
    */
  def metaMinMax(spark: SparkSession, dir: String, colName: String,
                 asOf: Option[Long] = None)
  : Option[(Option[Any], Option[Any])] = {
    import org.apache.spark.sql.types._
    val s = asOf.fold(snapshot(spark, dir))(snapshotAt(spark, dir, _))
    val safeType = tableSchema(s).exists(_.fields.exists(fd =>
      fd.name.equalsIgnoreCase(colName) && (fd.dataType match {
        case ByteType | ShortType | IntegerType | LongType | FloatType |
             DoubleType | StringType | BooleanType => true
        case _ => false
      })))
    if (!safeType || s.files.isEmpty) return None
    if (s.files.exists(fn => s.dvs.get(fn).exists(_.nonEmpty))) return None
    val key = colName.toLowerCase
    val perFile = s.files.map(fn => s.stats.get(fn).flatMap(_.cols.get(key)))
    if (perFile.exists(_.isEmpty)) return None
    val cs = perFile.flatten
    val fams = cs.map(_.typ).distinct
    if (fams.size != 1) return None
    val fam = fams.head
    // belt-and-braces: the schema gate above should make this
    // unreachable, but a family/schema disagreement must fall back,
    // never decode to the wrong type
    if (!Set("long", "double", "string", "bool").contains(fam)) return None
    def decode(v: String): Any = fam match {
      case "long" => v.toLong
      case "double" => v.toDouble
      case "bool" => v.toBoolean
      case _ => v
    }
    val mn = cs.foldLeft(Option.empty[String])((acc, c) =>
      Skipping.fold(fam, acc, c.min, keepMin = true))
    val mx = cs.foldLeft(Option.empty[String])((acc, c) =>
      Skipping.fold(fam, acc, c.max, keepMin = false))
    Some((mn.map(decode), mx.map(decode)))
  }


  /** One clause of a GENERAL `MERGE` ([[mergeGeneral]]). `kind` is
    * `update`, `delete` or `insert`; `condSql` the clause's `AND`
    * condition (None = unconditional); `set` the assignment list
    * (target column → value expression) for update/insert clauses.
    *
    * Expressions live in the PREFIXED namespace the executor joins
    * under: `__t_<col>` is the target row's column, `__s_<col>` the
    * source row's — so a SET expression can mix both sides without
    * ambiguity even though target and source share column names. The
    * SQL face ([[graft.plans.GraftDmlRule]]) produces these strings by
    * renaming the RESOLVED attribute references side-by-side, so
    * scoping is decided by the analyzer, not by string matching.
    */
  final case class MergeClause(kind: String, condSql: Option[String],
                               set: Seq[(String, String)])


  // ---------------------------------------------- data skipping

  /** Read only the files whose footer stats say they MIGHT satisfy
    * `predicateSql` (ANSI boolean expression over the table's columns),
    * then apply the predicate as a normal filter. Pruning is purely an
    * optimization: semantics come from the filter; a file with no stats,
    * an unparseable conjunct, or a column the evaluator cannot order is
    * simply kept. Driver cost is O(live files) over the in-memory
    * manifest — no file listing, no footer reads at query time (stats
    * were harvested at commit). After a [[compact]] with `clusterBy`,
    * files cover near-disjoint ranges and a selective predicate reads
    * O(matching files), not O(table) — at 100 TB this is the difference
    * between touching 3 files and 30 000.
    */
  def readWhere(spark: SparkSession, dir: String,
                predicateSql: String,
                asOf: Option[Long] = None): DataFrame = {
    // `asOf` pins a historical version (see [[snapshotAt]]) — its files
    // are immutable, so commit-time stats and bloom sidecars prune a
    // time-travel read exactly as they prune the head
    val s = asOf.fold(snapshot(spark, dir))(snapshotAt(spark, dir, _))
    require(s.files.nonEmpty, s"ManifestTable at $dir has no committed data")
    val kept = keptFiles(spark, dir, s, predicateSql)
    if (kept.isEmpty)
      // keep the schema, scan nothing: the optimizer folds `false` to an
      // empty relation before any file is opened
      readFiles(spark, dir, s, s.files)
        .where(predicateSql)
        .where(org.apache.spark.sql.functions.lit(false))
    else readFiles(spark, dir, s, kept).where(predicateSql)
  }

  /** The table's COMMIT HISTORY as a DataFrame — one row per manifest
    * version: (version, op, n_files, n_batches, rows_known, has_cdc).
    * `rows_known` sums the footer row counts of the files that HAVE
    * stats (null when any live file lacks them — a partial sum would
    * read as a total). Driver cost is O(versions) small manifest reads
    * over the [[expireLog]]-retained window (expired versions are
    * simply absent). The observability face of the table: which commit
    * grew it, which compacted it, which row-level op is CDC-consumable.
    */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val log = listLog(spark, dir)
    // the oldest RESOLVABLE version: 1 when the log is complete, else
    // the oldest surviving checkpoint ([[expireLog]] deletes only below
    // one, so everything from there resolves)
    val start =
      if (log.has(1L)) 1L
      else if (log.ckpt.nonEmpty) log.ckpt.keysIterator.min
      else 1L
    (start to log.head).map { v =>
      val s = resolveAt(spark, dir, v, log)
      val rowsKnown =
        if (s.files.forall(s.stats.contains))
          Some(s.files.map(f => s.stats(f).rows).sum -
            s.dvs.valuesIterator.flatten.map(_.rows).sum)
        else None
      (v, s.op, s.files.size, s.batchIds.size, rowsKnown,
        s.cdcPath.isDefined)
    }.toDF("version", "op", "n_files", "n_batches", "rows_known",
      "has_cdc")
  }

  /** One-row table summary (DESCRIBE DETAIL face): head version, live
    * file count and total recorded bytes, stats-known row count (DV
    * positions subtracted, null when any live file lacks footer stats),
    * partition layout, deletion-vector'd file count, constraint count,
    * absorbed batch-id count, and whether a schema is tracked. Pure
    * manifest math, zero data I/O — the operational at-a-glance read a
    * 100 TB table must answer without listing or scanning anything.
    */
  def detail(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = snapshot(spark, dir)
    val rowsKnown: Option[Long] = metaCount(spark, dir)
    Seq((s.version, s.files.size.toLong,
      s.files.map(f => s.sizes.getOrElse(f, 0L)).sum,
      rowsKnown.map(Long.box).orNull: java.lang.Long,
      s.partitionCols.mkString(","),
      s.dvs.size.toLong, s.constraints.size.toLong,
      s.batchIds.size.toLong, s.schemaJson.isDefined,
      // this driver's streaming sink's last swallowed maintenance
      // failure, if its most recent tick failed (null = healthy) — the
      // operational signal that self-maintenance is silently stuck
      ManifestSink.lastMaintenanceError(dir).orNull: String,
      // manifest-proven per-column distinct-count estimates (HLL
      // union over the tracked columns' per-file sketches; null when
      // the table tracks none) — the join-planning signal
      {
        val nd = metaNdv(spark, dir)
        if (nd.isEmpty) null
        else nd.toSeq.sortBy(_._1)
          .map { case (c, n) => s"$c=$n" }.mkString(",")
      }: String,
      // table properties (tags excluded — they have their own column)
      {
        val ps = s.properties.filterNot(_._1.startsWith(TagPropertyPrefix))
        if (ps.isEmpty) null
        else ps.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")
      }: String,
      // named version refs: tag=version, retention-pinned
      {
        val ts = tags(s)
        if (ts.isEmpty) null
        else ts.toSeq.sorted.map { case (t, v) => s"$t=$v" }.mkString(",")
      }: String))
      .toDF("version", "n_files", "size_bytes", "rows_known",
        "partition_cols", "n_dv_files", "n_constraints", "n_batches",
        "has_schema", "last_maintenance_error", "ndv", "properties",
        "tags")
  }

  /** The table's live PARTITIONS (SHOW PARTITIONS face): one row per
    * distinct partition tuple — each declared column's value as its
    * canonical string (null = the hive null partition) — with the
    * tuple's file count and stats-known row count (null when any of its
    * files lacks footer stats; deletion-vector positions subtracted).
    * Pure manifest math, zero data I/O. Raises on unpartitioned tables.
    */
  def partitions(spark: SparkSession, dir: String): DataFrame = {
    val s = snapshot(spark, dir)
    require(s.partitionCols.nonEmpty,
      s"ManifestTable at $dir has no declared partition columns")
    val cols = s.partitionCols.map(_.toLowerCase)
    val rows = s.files.groupBy(f => cols.map(c =>
      s.pvals.getOrElse(f, Map.empty).get(c).flatMap(_.value)))
      .toSeq.map { case (tuple, fs2) =>
        val rowsKnown: Option[Long] =
          if (fs2.forall(s.stats.contains))
            Some(fs2.map(f => s.stats(f).rows).sum -
              fs2.flatMap(f => s.dvs.getOrElse(f, Seq.empty)).map(_.rows).sum)
          else None
        org.apache.spark.sql.Row.fromSeq(
          tuple.map(_.orNull) ++
            Seq(fs2.size, rowsKnown.map(Long.box).orNull))
      }
    val schema = org.apache.spark.sql.types.StructType(
      cols.map(c => org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.StringType)) ++ Seq(
        org.apache.spark.sql.types.StructField("n_files",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("rows_known",
          org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** The PLANNER-INTEGRATED read (see [[ManifestFileIndex]]): a normal
    * DataFrame whose file list shrinks at planning time from whatever
    * filters Catalyst pushes toward the scan — `.where` chains, pushed
    * join probes, `spark.sql` over a view. Prefer this over [[readWhere]]
    * for composition; `readWhere` remains the explicit-predicate API
    * (and the two prune identically — same evaluator).
    */
  def scan(spark: SparkSession, dir: String,
           asOf: Option[Long] = None): DataFrame = {
    // built directly (not via the format face): a DV-carrying snapshot
    // returns the union plan — clean files through the pruned
    // FileIndex, DV'd files anti-joined — instead of refusing
    val snap = asOf.fold(snapshot(spark, dir))(snapshotAt(spark, dir, _))
    ManifestPlan.dataFrame(spark, dir, snap)
  }

  /** `keyCol IN (keys...)` as predicate SQL for [[readWhere]] /
    * [[pruneInfo]] — string keys are quoted and escaped, numeric keys
    * pass through. The seam the index sinks use for POINT-PROBE reads:
    * an inner or anti join on `keyCol` restricted to these keys sees
    * exactly the same matches against the pruned read as against the
    * full table (one-sided pruning keeps every file that might hold a
    * listed key).
    */
  def inPredicate(keyCol: String, keys: Seq[Any]): String = {
    require(keys.nonEmpty, "inPredicate needs at least one key")
    val lits = keys.map {
      case s: String => "'" + s.replace("'", "''") + "'"
      case n => n.toString
    }
    s"$keyCol IN (${lits.mkString(",")})"
  }

  /** (files kept, files total) that [[readWhere]] would scan for
    * `predicateSql` — the observable proof that skipping skipped.
    */
  def pruneInfo(spark: SparkSession, dir: String,
                predicateSql: String): (Int, Int) = {
    val s = snapshot(spark, dir)
    (keptFiles(spark, dir, s, predicateSql).size, s.files.size)
  }

  /** Two pruning passes, cheap one first: footer min/max stats (pure
    * in-memory manifest math), then bloom sidecars for the survivors'
    * required equality conjuncts. Both are one-sided: a file is dropped
    * only on proof no row can match.
    */
  private[ext] def keptFiles(spark: SparkSession, dir: String, s: Snapshot,
                        predicateSql: String): Seq[String] =
    // SQL strings speak LOGICAL names; the manifest's stats, blooms and
    // partition values are keyed PHYSICAL — translate before probing.
    // (keptForPredicate itself stays physical-namespace: the planner's
    // pushed dataFilters arrive already bound to the physical scan.)
    keptForPredicate(spark, dir, s, toPhysicalExpr(s, resolveStructPaths(s,
      spark.sessionState.sqlParser.parseExpression(predicateSql))))

  /** `pred` (PHYSICAL namespace) augmented with conjuncts DERIVED from
    * GENERATED ALWAYS AS column definitions — Delta's generated-column
    * partition-pruning trick, generalized to every pruning pass that
    * funnels through [[keptForPredicate]] (planner scan, SQL-string row
    * ops, merge candidate selection): for a column `g = f(c)`,
    *
    *   - `c = v`   implies `g = f(v)`    for ANY deterministic f,
    *   - `c IN (…)` maps elementwise the same way,
    *   - `c >= L`  implies `g >= f(L)`  (and `<=` dually; strict
    *     comparisons derive the NON-strict bound) when f is MONOTONE
    *     non-decreasing — CAST between timestamp/date, year(), trunc/
    *     date_trunc, substring(_, 1, n), and integral widening casts,
    *     composed freely.
    *
    * A `WHERE ts BETWEEN …` on a table partitioned by `day GENERATED
    * ALWAYS AS (CAST(ts AS DATE))` thus prunes the date partitions (and
    * any file whose recorded g-stats refute the bound) with zero user
    * rewrite — the derived conjunct rides the same one-sided evaluator,
    * partition point-stats included. Conjuncts only (never under OR/
    * NOT), one-sided soundness: `c op v` holding for a row makes
    * `g op' f(v)` hold by monotonicity and the stored `g <=> f(c)`
    * invariant; any derivation surprise (unresolvable expression,
    * NULL-valued f(v), type mismatch) just drops that conjunct.
    */
  private[graft] def withGeneratedDerived(spark: SparkSession, s: Snapshot,
      pred: org.apache.spark.sql.catalyst.expressions.Expression)
  : org.apache.spark.sql.catalyst.expressions.Expression = {
    val gens = generatedOf(s)
    if (gens.isEmpty) return pred
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, OneRowRelation, Project}
    import org.apache.spark.sql.types._
    val schema = tableSchema(s).getOrElse(return pred)
    // (physical child name) -> (resolved f-tree over one attr, monotone,
    // physical generated name, generated type)
    final case class Deriv(tree: Expression, monotone: Boolean,
                           gPhys: String, gType: DataType)
    def monotoneCast(from: DataType, to: DataType): Boolean =
      (from, to) match {
        case (a, b) if a == b => true
        case (TimestampType, DateType) | (DateType, TimestampType) => true
        case (TimestampNTZType, DateType) | (DateType, TimestampNTZType) =>
          true
        case (a @ (ByteType | ShortType | IntegerType | LongType),
              b @ (ByteType | ShortType | IntegerType | LongType)) =>
          b.defaultSize >= a.defaultSize // widening only: exact, ordered
        case _ => false
      }
    def monotone(e: Expression): Boolean = e match {
      case _: AttributeReference => true
      case c: Cast => monotoneCast(c.child.dataType, c.dataType) &&
        monotone(c.child)
      case y: Year => monotone(y.child)
      case t: TruncDate =>
        t.format.isInstanceOf[Literal] && monotone(t.date)
      case t: TruncTimestamp =>
        t.format.isInstanceOf[Literal] && monotone(t.timestamp)
      case sub: Substring => (sub.pos, sub.len) match {
        case (Literal(p: Int, _), _: Literal) if p == 1 => monotone(sub.str)
        case _ => false
      }
      case _ => false
    }
    val derivs: Map[String, Seq[Deriv]] = gens.flatMap { case (fd, genSql) =>
      try {
        val parsed = spark.sessionState.sqlParser.parseExpression(genSql)
        val refs = parsed.collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if a.nameParts.size == 1 => a.nameParts.head.toLowerCase
        }.distinct
        val multi = parsed.exists {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            => a.nameParts.size > 1
          case _ => false
        }
        if (refs.size != 1 || multi) None
        else schema.fields.find(_.name.equalsIgnoreCase(refs.head))
          .flatMap { cfd =>
            val attr = AttributeReference(cfd.name, cfd.dataType)()
            val proj = Project(
              Seq(Alias(Cast(parsed, fd.dataType), "__g")()),
              LocalRelation(attr))
            val analyzed = spark.sessionState.analyzer.execute(proj)
            analyzed.collectFirst { case p: Project =>
              p.projectList.head.asInstanceOf[Alias].child
            }.filter(_.deterministic)
              // a TIMEZONE-SENSITIVE tree (timestamp→date cast, trunc,
              // ...) evaluates with the READER's session timezone while
              // the stored generated/partition values were computed in
              // the writer's — derive only when the session matches the
              // pinned zone, else skip (pruning lost, never rows)
              .filter(tree => !tzSensitiveTree(tree) ||
                s.properties.get(GeneratedTzKey).contains(
                  spark.sessionState.conf.sessionLocalTimeZone))
              .map(tree =>
              physName(s, cfd.name).toLowerCase ->
                Deriv(tree, monotone(tree), physName(s, fd.name),
                  fd.dataType))
          }
      } catch { case scala.util.control.NonFatal(_) => None }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    if (derivs.isEmpty) return pred
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case o => Seq(o)
    }
    def childName(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name.toLowerCase)
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.nameParts.size == 1 => Some(a.nameParts.head.toLowerCase)
      case _ => None
    }
    def fOf(d: Deriv, l: Literal): Option[Literal] =
      try {
        if (l.value == null) None
        else {
          // the conjunct's literal may be typed looser than the child
          // column (a parsed `id = 9` carries an INT against a BIGINT
          // column) — cast it to the child type first, or the resolved
          // f-tree's eval would see the wrong internal representation
          val childT = d.tree.collectFirst {
            case a: AttributeReference => a.dataType }.getOrElse(l.dataType)
          val cv =
            if (childT == l.dataType) l.value
            else Cast(Literal.create(l.value, l.dataType), childT,
              Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)
          if (cv == null) return None
          val v = d.tree.transformUp {
            case _: AttributeReference => Literal.create(cv, childT)
          }.eval(null)
          if (v == null) None else Some(Literal.create(v, d.gType))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    def gAttr(d: Deriv) = AttributeReference(d.gPhys, d.gType)()
    val derived: Seq[Expression] = split(pred).flatMap { conj =>
      def forCol(e: Expression)(mk: Deriv => Option[Expression])
      : Seq[Expression] =
        childName(e).toSeq.flatMap(n =>
          derivs.getOrElse(n, Nil).flatMap(d => mk(d).toSeq))
      conj match {
        case EqualTo(a, l: Literal) => forCol(a)(d =>
          fOf(d, l).map(EqualTo(gAttr(d), _)))
        case EqualTo(l: Literal, a) => forCol(a)(d =>
          fOf(d, l).map(EqualTo(gAttr(d), _)))
        case GreaterThan(a, l: Literal) => forCol(a)(d =>
          if (!d.monotone) None
          else fOf(d, l).map(GreaterThanOrEqual(gAttr(d), _)))
        case GreaterThanOrEqual(a, l: Literal) => forCol(a)(d =>
          if (!d.monotone) None
          else fOf(d, l).map(GreaterThanOrEqual(gAttr(d), _)))
        case LessThan(a, l: Literal) => forCol(a)(d =>
          if (!d.monotone) None
          else fOf(d, l).map(LessThanOrEqual(gAttr(d), _)))
        case LessThanOrEqual(a, l: Literal) => forCol(a)(d =>
          if (!d.monotone) None
          else fOf(d, l).map(LessThanOrEqual(gAttr(d), _)))
        case GreaterThan(l: Literal, a) => forCol(a)(d =>
          if (!d.monotone) None
          else fOf(d, l).map(LessThanOrEqual(gAttr(d), _)))
        case GreaterThanOrEqual(l: Literal, a) => forCol(a)(d =>
          if (!d.monotone) None
          else fOf(d, l).map(LessThanOrEqual(gAttr(d), _)))
        case LessThan(l: Literal, a) => forCol(a)(d =>
          if (!d.monotone) None
          else fOf(d, l).map(GreaterThanOrEqual(gAttr(d), _)))
        case LessThanOrEqual(l: Literal, a) => forCol(a)(d =>
          if (!d.monotone) None
          else fOf(d, l).map(GreaterThanOrEqual(gAttr(d), _)))
        case In(a, list) if list.nonEmpty &&
            list.forall(_.isInstanceOf[Literal]) => forCol(a) { d =>
          val mapped = list.map(l => fOf(d, l.asInstanceOf[Literal]))
          if (mapped.exists(_.isEmpty)) None
          else Some(In(gAttr(d), mapped.map(_.get)))
        }
        case _ => Nil
      }
    }
    if (derived.isEmpty) pred
    else org.apache.spark.sql.catalyst.expressions.And(pred,
      derived.reduce(org.apache.spark.sql.catalyst.expressions.And(_, _)))
  }

  /** [[keptFiles]] over an already-built predicate expression — the
    * entry point [[ManifestFileIndex]] feeds the planner's pushed
    * dataFilters (resolved `AttributeReference` shapes) into. Same
    * one-sided stats + bloom passes as the SQL-string path. Predicates
    * on GENERATED-column sources first gain their derived conjuncts
    * ([[withGeneratedDerived]]) so partition values and stats recorded
    * on the generated column prune too.
    */
  private[graft] def keptForPredicate(spark: SparkSession, dir: String,
                                      s: Snapshot,
                                      pred0: org.apache.spark.sql.catalyst.expressions.Expression)
  : Seq[String] = {
    val pred =
      try withGeneratedDerived(spark, s, pred0)
      catch { case scala.util.control.NonFatal(_) => pred0 }
    // PARTITION pruning first (cheapest, exact): a file's recorded
    // partition values are point stats — min = max = value (or all-null
    // for the hive null partition) — so the same one-sided evaluator
    // proves non-matches exactly; files without recorded values (never
    // written by a partitioned stage) just skip the pass
    val partKept =
      if (s.pvals.isEmpty) s.files
      else s.files.filter { f =>
        s.pvals.get(f) match {
          case None => true
          case Some(pv) =>
            val cols = pv.map { case (c, pvv) =>
              c -> ColStats(pvv.fam, pvv.value, pvv.value,
                if (pvv.value.isEmpty) 1L else 0L)
            }
            !Skipping.skips(pred, FileStats(1L, cols))
        }
      }
    // rows == 0 is a PROOF no row matches any predicate — footer-backed,
    // so still one-sided (files without stats are never dropped)
    val kept = partKept.filter(f =>
      !s.stats.get(f).exists(st =>
        st.rows == 0L || Skipping.skips(pred, st)))
    val eqs = Skipping.eqConjuncts(pred)
    if (eqs.isEmpty) kept
    else kept.filter { file =>
      eqs.forall { case (c, lits) =>
        // the conjunct must hold, so the file may match only if SOME
        // literal might be present; no sidecar / unknown kind => keep
        s.stats.get(file).flatMap(_.cols.get(c)) match {
          case Some(cs) =>
            val tests = lits.flatMap(l => Skipping.bloomTest(cs.typ, l))
            if (tests.size != lits.size) true // some literal untestable
            else readBloom(spark, dir, file, c) match {
              case Some(bf) => tests.exists(t => t(bf))
              case None => true
            }
          case None => true
        }
      }
    }
  }

  // Sidecar cache: data files are immutable and UUID-named (names are
  // never reused), so a loaded bloom can be cached forever; the bound
  // just caps memory. Keyed per table+file+column.
  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      Option[org.apache.spark.util.sketch.BloomFilter]]()
  private val BloomCacheMax = 4096

  private[ext] def readBloom(spark: SparkSession, dir: String, file: String,
                        colName: String)
  : Option[org.apache.spark.util.sketch.BloomFilter] = {
    val key = bloomPath(dir, file, colName)
    val cached = bloomCache.get(key)
    if (cached != null) return cached
    val f = fs(spark, dir)
    val loaded =
      try {
        val path = p(key)
        if (!f.exists(path)) None
        else {
          val in = f.open(path)
          try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(in))
          finally in.close()
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    // evict one entry, not the map: a multi-table driver at the bound
    // keeps its working set warm instead of re-reading every sidecar
    while (bloomCache.size >= BloomCacheMax) {
      val it = bloomCache.keySet.iterator
      if (it.hasNext) bloomCache.remove(it.next()) else bloomCache.clear()
    }
    bloomCache.put(key, loaded)
    loaded
  }

  /** Build one bloom sidecar per (new data file, requested column) in a
    * SINGLE distributed pass over just the written batch — O(batch), not
    * O(table): rows carry their `input_file_name`, partial filters fold
    * per partition and merge per file. Only plain integral and string
    * columns participate (the two kinds with a stable hash contract on
    * both build and probe side); anything else is silently skipped and
    * simply never prunes. Sidecars land BEFORE the manifest commit, so a
    * crash strands orphan blooms for [[vacuum]], never a manifest whose
    * files lack their filters. Bloom pruning answers the query min/max
    * cannot: a point lookup on a high-cardinality column across
    * unclustered appends, where every file's [min, max] spans the whole
    * key space but each file holds ~1/N of the keys.
    */
  /** HLL precision: lgK = 9 (512 registers, ~3% relative error) — a
    * compact sketch is a few hundred bytes, small enough to live as a
    * manifest line per (file, tracked column) like the min/max stats.
    */
  private val NdvLgK = 9

  /** Per-file, per-column HLL sketches over the just-written `names` —
    * one aggregate pass of O(batch) (never the table), mirroring
    * [[buildBlooms]]. Values update the sketch by canonical string, so
    * the estimate is over the column's distinct VALUES whatever the
    * type; nulls don't count. Sketches are MERGEABLE (Datasketches
    * union), so table-level NDV is a driver-side fold over the
    * manifest — zero data I/O at question time ([[metaNdv]]).
    */
  private[ext] def buildNdv(spark: SparkSession, dir: String,
                       names: Seq[String], cols: Seq[String])
  : Map[String, Map[String, String]] = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    import org.apache.datasketches.hll.{HllSketch, Union}
    if (cols.isEmpty || names.isEmpty) return Map.empty
    val df = spark.read.parquet(names.map(n => dataFilePath(dir, n)): _*)
    val usable = cols.filter(c =>
      df.schema.fields.exists(_.name.equalsIgnoreCase(c)))
    if (usable.isEmpty) return Map.empty
    val nCols = usable.size
    val partials = df
      .select(input_file_name.as("_graft_file") +: usable.map(col): _*)
      .rdd.mapPartitions { it =>
        val acc = scala.collection.mutable.Map[(String, Int), HllSketch]()
        it.foreach { row =>
          val name = row.getString(0).split('/').last
          var i = 0
          while (i < nCols) {
            if (!row.isNullAt(i + 1))
              acc.getOrElseUpdate((name, i), new HllSketch(NdvLgK))
                .update(String.valueOf(row.get(i + 1)))
            i += 1
          }
        }
        acc.iterator.map { case (k, sk) => (k, sk.toCompactByteArray) }
      }.collect()
    partials.groupBy(_._1).toSeq.map { case ((file, i), parts) =>
      val u = new Union(NdvLgK)
      parts.foreach { case (_, bytes) => u.update(HllSketch.heapify(bytes)) }
      (file, usable(i).toLowerCase,
        java.util.Base64.getEncoder.encodeToString(
          u.getResult.toCompactByteArray))
    }.groupBy(_._1).map { case (file, entries) =>
      file -> entries.map(e => e._2 -> e._3).toMap
    }
  }

  /** Table-level NDV ESTIMATES from the manifest alone — the per-file
    * sketches union-merged on the driver, zero data I/O, zero jobs. A
    * column's estimate is returned only when EVERY live file carries a
    * sketch for it (the same one-sided honesty as [[metaCount]]); a
    * table with no tracked columns returns an empty map. DV'd deletes
    * make estimates upper bounds until their files rewrite — distinct
    * values cannot be subtracted from a union sketch.
    */
  def metaNdv(spark: SparkSession, dir: String): Map[String, Long] = {
    import org.apache.datasketches.hll.{HllSketch, Union}
    val s = snapshot(spark, dir)
    if (s.ndvCols.isEmpty || s.files.isEmpty) return Map.empty
    // sketches are keyed PHYSICAL (stable across renames); surface the
    // current LOGICAL name — the one a user's query speaks
    val inv = s.colMap.map { case (l, ph) => (ph.toLowerCase, l) }.toMap
    s.ndvCols.flatMap { c0 =>
      val c = c0.toLowerCase
      val sketches = s.files.map(f => s.ndv.get(f).flatMap(_.get(c)))
      if (sketches.exists(_.isEmpty)) None // a file predates tracking
      else {
        val u = new Union(NdvLgK)
        sketches.flatten.foreach(b64 => u.update(HllSketch.heapify(
          java.util.Base64.getDecoder.decode(b64))))
        Some(inv.getOrElse(c, c) -> math.round(u.getResult.getEstimate))
      }
    }.toMap
  }

  private[ext] def buildBlooms(spark: SparkSession, dir: String,
                          names: Seq[String], cols: Seq[String],
                          stats: Map[String, FileStats],
                          fpp: Double): Unit = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    import org.apache.spark.util.sketch.BloomFilter
    if (cols.isEmpty || names.isEmpty) return
    val f = fs(spark, dir)
    val df = spark.read.parquet(names.map(n => dataFilePath(dir, n)): _*)
    val usable = cols.filter(c => df.schema.fields.exists(fd =>
      fd.name.equalsIgnoreCase(c) && (fd.dataType match {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.StringType => true
        case _ => false
      })))
    if (usable.isEmpty) return
    val expected = names.map(n =>
      n -> math.max(16L, stats.get(n).map(_.rows).getOrElse(1L << 20))).toMap
    val nCols = usable.size
    val merged = df
      .select(input_file_name.as("_graft_file") +: usable.map(col): _*)
      .rdd.mapPartitions { it =>
        val acc = scala.collection.mutable.Map[(String, Int), BloomFilter]()
        it.foreach { row =>
          val name = row.getString(0).split('/').last
          var i = 0
          while (i < nCols) {
            if (!row.isNullAt(i + 1)) {
              val bf = acc.getOrElseUpdate((name, i),
                BloomFilter.create(expected.getOrElse(name, 1L << 20), fpp))
              row.get(i + 1) match {
                case s: String => bf.putString(s)
                case n: java.lang.Number => bf.putLong(n.longValue())
                case _ => ()
              }
            }
            i += 1
          }
        }
        acc.iterator
      }
      .reduceByKey { (a, b) => a.mergeInPlace(b); a }
      .collect()
    f.mkdirs(p(bloomDir(dir)))
    merged.foreach { case ((file, i), bf) =>
      val out = f.create(p(bloomPath(dir, file, usable(i))), true)
      try bf.writeTo(out) finally out.close()
    }
  }

  /** The interleaved-bit z-value of `cols` as one codegen-friendly
    * column expression: each column is bucketed into 2^8 uniform cells
    * between its table-wide min and max (one small aggregate job,
    * collected here — k doubles, not data), then bit i of every bucket
    * id lands at position `i * nCols + colIndex` of the key. Nulls and
    * degenerate (min == max) columns bucket to 0. ~`8 * nCols * 3`
    * integer ops per row, all inside whole-stage codegen.
    */
  private[ext] def zvalue(df: DataFrame,
                     cols: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val bits = 8
    val buckets = 1 << bits
    val aggCols = cols.flatMap(c => Seq(
      min(col(c).cast("double")), max(col(c).cast("double"))))
    val bounds = df.agg(aggCols.head, aggCols.tail: _*).head()
    val bucketCols = cols.zipWithIndex.map { case (c, i) =>
      require(!bounds.isNullAt(2 * i),
        s"zorder column $c is not numeric (or all null)")
      val (mn, mx) = (bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
      if (mx <= mn) lit(0L)
      else coalesce(least(greatest(
        // width_bucket: 0 below min, buckets+1 at/above max — clamp into
        // [0, buckets-1]
        width_bucket(col(c).cast("double"), lit(mn), lit(mx), lit(buckets))
          - lit(1), lit(0L)), lit(buckets - 1L)), lit(0L)).cast("long")
    }
    val n = cols.size
    (0 until bits).foldLeft(lit(0L)) { (acc, bit) =>
      bucketCols.zipWithIndex.foldLeft(acc) { case (a, (bc, ci)) =>
        a.bitwiseOR(shiftleft(
          shiftright(bc, bit).bitwiseAND(lit(1L)), bit * n + ci))
      }
    }
  }

  /** Harvest [[FileStats]] from the parquet FOOTERS of `names` under
    * `data/` — row counts and per-column min/max/null-counts are already
    * sitting in each file's metadata, so this is O(files) small reads on
    * the driver (the Iceberg collection strategy), never a scan of the
    * data just written. A file whose footer cannot be read yields no
    * stats (it stays readable and unpruned).
    */
  private[ext] def footerStats(spark: SparkSession, dir: String,
                          names: Seq[String]): Map[String, FileStats] = {
    val conf = spark.sparkContext.hadoopConfiguration
    def one(n: String): Option[(String, FileStats)] =
      scala.util.Try(collectFooter(conf, p(dataFilePath(dir, n))))
        .toOption.map(n -> _)
    // the footer harvest is driver-side small I/O; a commit that lands
    // many files (a compaction, a large backfill) must not pay it one
    // file at a time — bounded pool, same results in any order
    if (names.size <= 2) names.flatMap(one).toMap
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, names.size))
      try names.map(n => pool.submit(
          new java.util.concurrent.Callable[Option[(String, FileStats)]] {
            override def call(): Option[(String, FileStats)] = one(n)
          })).flatMap(_.get()).toMap
      finally pool.shutdown()
    }
  }

  private def collectFooter(conf: org.apache.hadoop.conf.Configuration,
                            path: org.apache.hadoop.fs.Path): FileStats = {
    import scala.jdk.CollectionConverters._
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf))
    try {
      val md = r.getFooter
      val schema = md.getFileMetaData.getSchema
      val blocks = md.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      // fold (typ, min, max, nulls, usable) per column across row groups
      var acc = Map.empty[String, (String, Option[String], Option[String], Long, Boolean)]
      for (b <- blocks; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString.toLowerCase
        val fam = Skipping.family(
          schema.getType(c.getPath.toArray: _*).asPrimitiveType)
        val st = c.getStatistics
        val prev = acc.getOrElse(name, (fam.getOrElse(""), None, None, 0L, true))
        val next =
          if (fam.isEmpty || st == null || !st.isNumNullsSet || !prev._5)
            (prev._1, None, None, 0L, false)
          else if (!st.hasNonNullValue) {
            if (st.getNumNulls == b.getRowCount) // genuinely all-null block
              (prev._1, prev._2, prev._3, prev._4 + st.getNumNulls, true)
            else (prev._1, None, None, 0L, false) // stats dropped (e.g. oversized)
          } else {
            val (mn, mx) = Skipping.canonical(fam.get, st)
            if (mn.isEmpty) (prev._1, None, None, 0L, false) // NaN etc.
            else (prev._1,
              Skipping.fold(fam.get, prev._2, mn, keepMin = true),
              Skipping.fold(fam.get, prev._3, mx, keepMin = false),
              prev._4 + st.getNumNulls, true)
          }
        acc = acc.updated(name, next)
      }
      FileStats(rows, acc.collect { case (n, (typ, mn, mx, nulls, true)) =>
        n -> ColStats(typ, mn, mx, nulls)
      })
    } finally r.close()
  }

  /** Every this-many versions the commit path also writes a FULL
    * checkpoint, bounding snapshot resolution to that many delta
    * replays past the nearest checkpoint. 10 is Delta's default.
    */
  private[graft] val CheckpointInterval = 10L

  /** The per-file detail lines (size, row count, column stats) for
    * `files` — a checkpoint writes them for every live file, a delta
    * only for the files its commit ADDED.
    */
  private def detailLines(files: Seq[String], stats: Map[String, FileStats],
                          sizes: Map[String, Long]): Seq[String] =
    files.flatMap { fn =>
      sizes.get(fn).map(b => s"size:$fn\t$b").toSeq ++
        stats.get(fn).toSeq.flatMap { fs =>
          s"rows:$fn\t${fs.rows}" +: fs.cols.toSeq.sortBy(_._1).map {
            case (c, cs) =>
              s"col:$fn\t${enc(c)}\t${cs.typ}\t${cs.nulls}\t" +
                (if (cs.min.isDefined) s"1\t${enc(cs.min.get)}\t${enc(cs.max.get)}"
                 else "0\t\t")
          }
        }
    }

  /** The `pv:` lines for `files` (a checkpoint passes every live file, a
    * delta only its adds — same split as [[detailLines]]).
    */
  private def pvLines(files: Seq[String],
                      pvals: Map[String, Map[String, PartValue]]): Seq[String] =
    files.flatMap(fn => pvals.get(fn).toSeq.flatMap(_.toSeq.sortBy(_._1).map {
      case (c, pvv) =>
        s"pv:$fn\t${enc(c)}\t${pvv.fam}\t" +
          (if (pvv.value.isDefined) s"1\t${enc(pvv.value.get)}" else "0\t")
    }))

  private def ndvLines(files: Seq[String],
                       ndv: Map[String, Map[String, String]]): Seq[String] =
    files.flatMap(fn => ndv.get(fn).toSeq.flatMap(_.toSeq.sortBy(_._1).map {
      case (c, b64) => s"ndv:$fn\t${enc(c)}\t$b64"
    }))

  private def ndvColsLine(cols: Seq[String]): String =
    "ndvcols:" + cols.map(enc).mkString("\t")

  private def partColsLine(cols: Seq[String]): String =
    "partcols:" + cols.map(enc).mkString("\t")

  /** Stage `lines` and publish them as `_manifest/<name>` with an atomic
    * CREATE-IF-ABSENT, returning whether this writer won. Not
    * exists-then-rename: on the local filesystem FileSystem.rename maps
    * to POSIX rename(2), which silently REPLACES an existing
    * destination, so two racing committers could both pass the exists
    * check and the second would overwrite the first (lost commit).
    * link(2) IS atomic create-if-absent, so for file:// we hardlink the
    * staged file into place and let FileAlreadyExistsException signal
    * the lost race. Elsewhere keep rename: HDFS rename refuses an
    * existing destination atomically; object stores without that need a
    * lock service (Delta's documented caveat).
    */
  private def publishLog(f: org.apache.hadoop.fs.FileSystem, dir: String,
                         name: String, lines: Seq[String]): Boolean = {
    f.mkdirs(p(manifestDir(dir)))
    val tmp = p(s"${manifestDir(dir)}/.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val target = p(s"${manifestDir(dir)}/$name")
    val won =
      if ("file".equalsIgnoreCase(f.getUri.getScheme)) {
        try {
          java.nio.file.Files.createLink(
            new java.io.File(target.toUri.getPath).toPath,
            new java.io.File(tmp.toUri.getPath).toPath)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else !f.exists(target) && f.rename(tmp, target)
    f.delete(tmp, false)
    won
  }

  /** Write a full checkpoint of `s` as `v<version>`. Best-effort and
    * race-tolerant: the delta for the version is the commit of record,
    * so a lost race (another committer checkpointed the same version —
    * byte-identical content) or an I/O failure here costs only replay
    * speed, never correctness.
    */
  private[ext] def writeCheckpoint(spark: SparkSession, dir: String,
                              s: Snapshot): Unit =
    try {
      val lines =
        s.files.map("file:" + _) ++
          (if (s.op.nonEmpty) Seq("op:" + s.op) else Nil) ++
          s.schemaJson.map(j => "schema:" + enc(j)).toSeq ++
          s.cdcPath.map("cdc:" + _).toSeq ++
          (if (s.partitionCols.nonEmpty) Seq(partColsLine(s.partitionCols))
           else Nil) ++
          s.batchIds.toSeq.sorted.map("batch:" + _) ++
          s.dvs.toSeq.sortBy(_._1).flatMap { case (file, refs) =>
            refs.map(r => s"dv:$file\t${r.name}\t${r.rows}")
          } ++
          s.constraints.toSeq.sortBy(_._1).map { case (n, e) =>
            s"constraint:${enc(n)}\t${enc(e)}"
          } ++
          s.properties.toSeq.sortBy(_._1).map { case (k, v) =>
            s"property:${enc(k)}\t${enc(v)}"
          } ++
          (if (s.ndvCols.nonEmpty) Seq(ndvColsLine(s.ndvCols)) else Nil) ++
          s.colMap.map { case (l, ph) => s"colmap:${enc(l)}\t${enc(ph)}" } ++
          s.retiredCols.map(ph => "retired:" + enc(ph)) ++
          pvLines(s.files, s.pvals) ++
          ndvLines(s.files, s.ndv) ++
          detailLines(s.files, s.stats, s.sizes)
      publishLog(fs(spark, dir), dir, s"v${"%08d".format(s.version)}", lines)
      // advance the pointer even on a lost publish race — the content
      // at this version is byte-identical whoever wrote it
      writeLastCheckpoint(spark, dir, s.version)
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Force a checkpoint of the current head — LOG COMPACTION on demand
    * (the commit path already checkpoints every [[CheckpointInterval]]
    * versions). Returns the checkpointed version (0 = empty table,
    * nothing written).
    */
  def checkpoint(spark: SparkSession, dir: String): Long = {
    val s = snapshot(spark, dir)
    if (s.version > 0L) writeCheckpoint(spark, dir, s)
    s.version
  }

  /** LOG RETENTION — the other half of what keeps `_manifest/` bounded
    * (the pointer stops per-query LISTs; this stops the directory
    * itself growing forever: a 10 s-cadence streaming sink writes ~3M
    * log names a year). Deletes every log file STRICTLY BELOW the
    * newest checkpoint at or below `head - retainVersions`, then bumps
    * the pointer there, so:
    *
    *   - every version in the retained window still resolves (the
    *     oldest surviving file is a full checkpoint; all deltas above
    *     it survive) — time travel, the feeds and the streaming source
    *     keep working over `[keepFrom, head]`;
    *   - versions below it become UNRESOLVABLE — the documented
    *     retention contract (Delta's `logRetentionDuration`). Their
    *     CDC/DV sidecars lose their last reference and the next
    *     [[vacuum]] sweeps them past its grace window.
    *
    * Run it with [[vacuum]] as table maintenance. Returns the number of
    * log files deleted (0 when no checkpoint is old enough — including
    * always on a pre-checkpoint table, whose whole log is younger than
    * one interval).
    */
  def expireLog(spark: SparkSession, dir: String,
                retainVersions: Long = 1000L): Int = {
    require(retainVersions >= 0L, "retainVersions must be >= 0")
    val f = fs(spark, dir)
    val log = listLog(spark, dir) // maintenance pass: the one full LIST
    // a TAG pins its version's resolvability: the expiry floor never
    // rises past the oldest tagged version, whatever retainVersions says
    val oldestTag = tags(snapshot(spark, dir)).values
      .foldLeft(Long.MaxValue)(math.min)
    val cutoff = math.min(log.head - retainVersions, oldestTag)
    val keepFrom = log.ckpt.keysIterator.filter(_ <= cutoff)
      .foldLeft(0L)(math.max)
    if (keepFrom <= 0L) return 0
    val doomed =
      log.ckpt.filter(_._1 < keepFrom).values ++
        log.delta.filter(_._1 < keepFrom).values
    val n = doomed.count { st => f.delete(st.getPath, false) }
    writeLastCheckpoint(spark, dir, keepFrom)
    n
  }

  /** CAS loop: read head, apply `update` (None = no-op), publish the
    * commit's DELTA (O(change) lines — the set difference between the
    * head and the callback's result); a lost create-if-absent means
    * another commit won — re-read and retry. After winning, the applied
    * snapshot is cached (derived by REPLAYING the just-written delta, so
    * cache and readers can never disagree) and every
    * [[CheckpointInterval]]-th version also writes a full checkpoint.
    * Returns true if this call committed.
    */
  @tailrec
  private[ext] def commit(spark: SparkSession, dir: String)
                    (update: Snapshot => Option[Snapshot])
  : Boolean = {
    val f = fs(spark, dir)
    val old = snapshot(spark, dir)
    update(old) match {
      case None => false
      case Some(next0) =>
        val next = old.version + 1
        val oldSet = old.files.toSet
        val newSet = next0.files.toSet
        val adds = next0.files.filterNot(oldSet)
        val removes = old.files.filterNot(newSet)
        val newBatches = (next0.batchIds -- old.batchIds).toSeq.sorted
        // refs per file normally APPEND (each new DV marks positions
        // the prior ones don't) and the delta carries the new suffix; a
        // commit that SHRINKS or rewrites a surviving file's refs (only
        // restore does this) emits cleardv: + the full new list, so a
        // cold replay reconstructs the exact state
        val dvCleared = next0.files.filter { fn =>
          oldSet.contains(fn) && {
            val o = old.dvs.getOrElse(fn, Seq.empty)
            val n = next0.dvs.getOrElse(fn, Seq.empty)
            !(n.size >= o.size && n.take(o.size) == o)
          }
        }.toSet
        val dvAdds = next0.dvs.toSeq.sortBy(_._1).flatMap {
          case (file, refs) =>
            val pre = if (dvCleared.contains(file)) Seq.empty
                      else old.dvs.getOrElse(file, Seq.empty)
            refs.drop(pre.size).map(file -> _)
        }
        val consAdd = next0.constraints.toSeq.sortBy(_._1).filterNot {
          case (k, v) => old.constraints.get(k).contains(v)
        }
        val consDrop =
          (old.constraints.keySet -- next0.constraints.keySet).toSeq.sorted
        val propsSet = next0.properties.toSeq.sortBy(_._1).filterNot {
          case (k, v) => old.properties.get(k).contains(v)
        }
        val propsUnset =
          (old.properties.keySet -- next0.properties.keySet).toSeq.sorted
        val lines =
          (if (next0.op.nonEmpty) Seq("op:" + next0.op) else Nil) ++
            next0.schemaJson.filterNot(old.schemaJson.contains)
              .map(j => "schema:" + enc(j)).toSeq ++
            next0.cdcPath.map("cdc:" + _).toSeq ++
            (if (next0.partitionCols != old.partitionCols)
              Seq(partColsLine(next0.partitionCols)) else Nil) ++
            (if (next0.ndvCols != old.ndvCols)
              Seq(ndvColsLine(next0.ndvCols)) else Nil) ++
            (if (next0.colMap != old.colMap)
              next0.colMap.map { case (l, ph) =>
                s"colmap:${enc(l)}\t${enc(ph)}" } else Nil) ++
            (if (next0.retiredCols != old.retiredCols)
              next0.retiredCols.map(ph => "retired:" + enc(ph)) else Nil) ++
            adds.map("add:" + _) ++
            removes.map("remove:" + _) ++
            newBatches.map("batch:" + _) ++
            dvCleared.toSeq.sorted.map("cleardv:" + _) ++
            dvAdds.map { case (file, r) => s"dv:$file\t${r.name}\t${r.rows}" } ++
            consAdd.map { case (n, e) => s"constraint:${enc(n)}\t${enc(e)}" } ++
            consDrop.map(n => "dropconstraint:" + enc(n)) ++
            propsSet.map { case (k, v) => s"property:${enc(k)}\t${enc(v)}" } ++
            propsUnset.map(k => "dropproperty:" + enc(k)) ++
            pvLines(adds, next0.pvals) ++
            ndvLines(adds, next0.ndv) ++
            detailLines(adds, next0.stats, next0.sizes)
        if (!publishLog(f, dir, s"d${"%08d".format(next)}", lines))
          commit(spark, dir)(update) // lost the race: retry on new head
        else {
          val applied = applyDelta(old, parseLog(lines.toList), next)
          val st = f.getFileStatus(
            p(s"${manifestDir(dir)}/d${"%08d".format(next)}"))
          // mirror cacheKey's delta-key shape (v-1's identity folded in,
          // checkpoint file preferred) so the next read resolves warm;
          // one extra getFileStatus on the WRITE path only
          def prevStat(name: String) =
            try Some(f.getFileStatus(p(s"${manifestDir(dir)}/$name")))
            catch { case _: java.io.FileNotFoundException => None }
          val prev =
            if (old.version == 0L) ""
            else prevStat(s"v${"%08d".format(old.version)}")
              .orElse(prevStat(s"d${"%08d".format(old.version)}"))
              .map(ps => s"#${ps.getLen}#${ps.getModificationTime}")
              .getOrElse("")
          cachePut(
            Some(s"$dir#$next#${st.getLen}#${st.getModificationTime}$prev"),
            applied)
          if (next % CheckpointInterval == 0L)
            writeCheckpoint(spark, dir, applied)
          true
        }
    }
  }
}
