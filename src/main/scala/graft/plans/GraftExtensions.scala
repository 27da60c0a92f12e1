package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of the graft function surface so SQL and DataFrame callers
  * share one implementation (SURVEY.md §7 build plan item 3).
  *
  * Two entry points:
  *  - `GraftExtensions` for the builder path:
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.plans.GraftExtensions`;
  *  - `GraftFunctions.register(spark)` for a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectResolutionRule(session => new GraftDmlRule(session))
    e.injectResolutionRule(session => new GraftReadOptions(session))
    e.injectPostHocResolutionRule(session => new GraftV2Reads(session))
  }
}

/** BATCH READER OPTIONS through the catalog table name:
  * `spark.read.option(...).table("cat.t")` puts its options on the
  * resolved `DataSourceV2Relation`, where the plain conversion used to
  * ignore them — `readChangeFeed` silently read the table level. This
  * RESOLUTION rule (it must run before the analyzer expands `*`, since
  * the change feed adds columns) rewrites a graft relation carrying
  * recognized read options into the engine's own plan:
  *
  *   - `readChangeFeed = true` → [[ManifestTable.changesBetween]] over
  *     `[startingVersion, endingVersion|head]` — the batch face of the
  *     CDC feed, `_change_type` + `commit_version` columns.
  *     `startingVersion` is INCLUSIVE (the Delta CDF convention);
  *     `sinceVersion` spells the same bound EXCLUSIVELY;
  *   - `sinceVersion` / `sinceTimestamp` alone → the append feed
  *     ([[ManifestTable.appendsBetween]], `commit_version` column).
  *
  * `versionAsOf` / `timestampAsOf` need no rewrite — Spark's own
  * relation resolution turns them into a time-travel
  * `loadTable(ident, version)`, which [[graft.ext.GraftCatalog]]
  * already pins — so this rule leaves them alone (and rejects them
  * COMBINED with the feed options, whose ranges are versioned
  * explicitly via startingVersion/endingVersion).
  *
  * Any OTHER option is a loud error — an unrecognized reader option
  * silently reading the table level is exactly the drift this rule
  * exists to kill. Write targets never carry these options (and the
  * rule leaves optionless relations alone), so DML is unaffected.
  */
class GraftReadOptions(session: SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {

  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
  import graft.ext.ManifestTable

  private val recognized = Set("readchangefeed", "startingversion",
    "endingversion", "sinceversion", "sincetimestamp")

  /** Handled natively by Spark's time-travel resolution (the catalog's
    * pinned loadTable) — recognized, but no rewrite here.
    */
  private val native = Set("versionasof", "timestampasof")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[graft.ext.GraftTableV2] &&
            !r.options.isEmpty =>
        val t = r.table.asInstanceOf[graft.ext.GraftTableV2]
        val opts = {
          val m = scala.collection.mutable.Map.empty[String, String]
          r.options.forEach((k, v) => m.update(k.toLowerCase, v))
          m.toMap
        }
        val unknown = opts.keySet -- recognized -- native
        if (unknown.nonEmpty)
          throw new IllegalArgumentException(
            s"unrecognized reader option(s) ${unknown.mkString(", ")} on " +
              s"graft table ${t.name()} — supported: readChangeFeed, " +
              "startingVersion/endingVersion, sinceVersion/sinceTimestamp, " +
              "versionAsOf/timestampAsOf (refusing to silently read the " +
              "table level)")
        else if (opts.keySet.intersect(recognized).isEmpty) r // time travel
        else convert(t, opts)
    }

  private def convert(t: graft.ext.GraftTableV2,
                      opts: Map[String, String]): LogicalPlan = {
    require(opts.keySet.intersect(native).isEmpty,
      s"versionAsOf/timestampAsOf cannot combine with the feed options " +
        s"on ${t.name()} — bound the feed with startingVersion/" +
        "endingVersion instead")
    val dir = t.dir
    def head = ManifestTable.headVersion(session, dir)
    val df =
      if (opts.get("readchangefeed").exists(_.equalsIgnoreCase("true"))) {
        // `startingVersion` is INCLUSIVE (the Delta CDF convention a
        // porting consumer expects); `sinceVersion` is the exclusive
        // spelling. changesBetween covers (from, to], so the inclusive
        // option shifts its lower bound by one.
        // clamp: startingVersion=0 is the Delta "whole history"
        // spelling — an unclamped -1 would fail changesBetween's bounds.
        // NEGATIVE input is a caller bug (Delta validates it too): raise
        // rather than silently reading the whole history
        val from = opts.get("startingversion")
          .map { v0 =>
            val v = v0.toLong
            require(v >= 0L,
              s"startingVersion must be >= 0, got $v")
            math.max(0L, v - 1)
          }
          .orElse(opts.get("sinceversion").map(_.toLong))
          .orElse(opts.get("sincetimestamp").map(ts =>
            ManifestTable.versionAt(session, dir, ts.toLong)))
          .getOrElse(0L)
        val to = opts.get("endingversion").map(_.toLong).getOrElse(head)
        ManifestTable.changesBetween(session, dir, from, to)
      } else {
        val from = opts.get("sinceversion").map(_.toLong)
          .orElse(opts.get("sincetimestamp").map(ts =>
            ManifestTable.versionAt(session, dir, ts.toLong)))
          .getOrElse(throw new IllegalArgumentException(
            s"reader options on ${t.name()} need readChangeFeed, " +
              "versionAsOf/timestampAsOf or sinceVersion/sinceTimestamp"))
        // endingVersion bounds the append feed like it bounds the CDC
        // feed — incremental backfill in fixed version windows
        ManifestTable.appendsBetween(session, dir, from,
          opts.get("endingversion").map(_.toLong).getOrElse(head))
      }
    df.queryExecution.analyzed
  }
}

/** Converts a [[graft.ext.GraftCatalog]] table's resolved V2 relations
  * into the planner-integrated V1 read
  * ([[graft.ext.ManifestPlan.dataFrame]]): `SELECT` over a graft table
  * plans as a `FileSourceScanExec` whose file list the
  * [[graft.ext.ManifestFileIndex]] prunes with manifest stats, blooms
  * and partition tuples — the same plan `ManifestTable.scan` builds —
  * instead of the V1Scan fallback's row-at-a-time bridge. The standard
  * table-format move (Delta's DeltaAnalysis does exactly this).
  *
  * WRITE TARGETS must stay V2 relations — a converted target would send
  * `INSERT` through a raw parquet write, bypassing the manifest commit —
  * so the traversal skips `V2WriteCommand.table`, `InsertIntoStatement`
  * targets and `DeleteFromTable` entirely (their data still flows
  * through the manifest via the V1 write bridge / SupportsDeleteV2).
  * Relations this rule leaves untouched (e.g. inside subquery
  * expressions, which it does not descend into) remain CORRECT through
  * the table's own V1Scan fallback — conversion is a plan upgrade, not
  * a correctness requirement.
  */
class GraftV2Reads(session: SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.catalyst.plans.logical.{AddCheckConstraint, AddConstraint, DeleteFromTable, InsertIntoStatement, LogicalPlan, Project, V2WriteCommand}
  import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
  import org.apache.spark.sql.execution.datasources.DataSource
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
  import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation

  private def convert(plan: LogicalPlan): LogicalPlan = plan match {
    case w: V2WriteCommand => w.withNewQuery(convert(w.query))
    case i: InsertIntoStatement => i.copy(query = convert(i.query))
    case d: DeleteFromTable => d
    // constraint DDL validates against the table and then routes to
    // alterTable — both need the V2 relation intact (a converted V1
    // read would leave AddCheckConstraint with no physical plan)
    case c: AddCheckConstraint => c
    case c: AddConstraint => c
    // `spark.readStream.table("cat.t")` — the catalog table as a
    // STREAM. The V2 table deliberately does not claim
    // MICRO_BATCH_READ (a V2 MicroBatchStream would re-implement the
    // per-file read loop Spark's parquet relation already does well);
    // instead the streaming relation rewrites to the graft-manifest V1
    // source — version-offset micro-batches over exactly the appended
    // files, reader options (`readChangeFeed`, `sinceVersion`,
    // `sinceTimestamp`, `maxVersionsPerTrigger`, `maxFilesPerTrigger`,
    // `maxBytesPerTrigger`) passing through verbatim. Same move as the
    // batch conversion below, same authority: the table's manifest,
    // resolved per micro-batch.
    case s: StreamingRelationV2
        if s.table.isInstanceOf[graft.ext.GraftTableV2] =>
      val t = s.table.asInstanceOf[graft.ext.GraftTableV2]
      require(t.pinned.isEmpty,
        s"cannot stream a time-travel pinned version of ${t.name()}; " +
          "start from a historical point with option sinceVersion/" +
          "sinceTimestamp instead")
      val opts = {
        val m = scala.collection.mutable.Map.empty[String, String]
        s.extraOptions.forEach((k, v) => m.update(k, v))
        m.toMap + ("path" -> t.dir)
      }
      val v1 = StreamingRelation(DataSource(session,
        className = "graft-manifest", options = opts))
      if (v1.output.size != s.output.size) v1 // CDC adds feed columns
      else Project(s.output.zip(v1.output).map { case (tgt, src) =>
        Alias(src, tgt.name)(exprId = tgt.exprId,
          qualifier = tgt.qualifier)
      }, v1)
    case r: DataSourceV2Relation
        if r.table.isInstanceOf[graft.ext.GraftTableV2] =>
      val t = r.table.asInstanceOf[graft.ext.GraftTableV2]
      // every LogicalRelation under a table name must carry its
      // CatalogTable: Spark's Catalog.refreshTable (which
      // MicroBatchExecution invokes after every toTable batch) walks
      // the resolved plan and calls `catalogTable.get` UNGUARDED on
      // each one — a bare relation crashes it with None.get
      val ct = Some(t.v1Table)
      val v1 = t.readDataFrame(session).queryExecution.analyzed
        .transformUp {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
              if lr.catalogTable.isEmpty => lr.copy(catalogTable = ct)
        }
      if (v1.output.size != r.output.size) r // shape drifted: keep V2
      else
        // rebind to the V2 relation's attribute ids so every parent
        // operator's resolved references keep pointing at this scan
        Project(r.output.zip(v1.output).map { case (tgt, src) =>
          Alias(src, tgt.name)(exprId = tgt.exprId,
            qualifier = tgt.qualifier)
        }, v1)
    case other => other.mapChildren(convert)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = convert(plan)
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  /** (name, info, builder) for every injected function. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_token_count",
      info("graft_token_count", "approximate token count (~4 chars/token)"),
      (args: Seq[Expression]) => TokenCountApprox(args.head)),
    ("graft_is_suspicious",
      info("graft_is_suspicious", "true when a translation value looks like a failure artifact"),
      (args: Seq[Expression]) => new IsSuspiciousTranslation(args.head)),
    ("graft_bpe_token_count",
      info("graft_bpe_token_count", "BPE token count over the committed merges table"),
      (args: Seq[Expression]) => BpeTokenCount(args.head)),
    ("graft_minhash_sig",
      info("graft_minhash_sig", "MinHash signature of a shingle array (numHashes minima)"),
      (args: Seq[Expression]) => MinHashSignature(args(0), args(1))),
    ("graft_char_shingles",
      info("graft_char_shingles", "distinct character k-shingles of a text column"),
      (args: Seq[Expression]) => CharShingles(args(0), args(1))),
    ("graft_word_shingles",
      info("graft_word_shingles", "distinct word n-gram shingles of a text column"),
      (args: Seq[Expression]) => WordShingles(args(0), args(1))),
    ("graft_simhash32",
      info("graft_simhash32", "32-bit SimHash of a text column"),
      (args: Seq[Expression]) => SimHash32(args.head)),
    ("graft_cosine",
      info("graft_cosine", "cosine similarity of two float/double vectors"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    ("graft_l2sq",
      info("graft_l2sq", "squared L2 distance of two float/double vectors"),
      (args: Seq[Expression]) => L2Sq(args(0), args(1))),
    ("graft_hyperplane_bucket",
      info("graft_hyperplane_bucket",
        "hyperplane-LSH bucket id of a float/double vector"),
      (args: Seq[Expression]) =>
        HyperplaneBucket(args(0), args(1), args(2), args(3))),
    ("graft_rolling_hash",
      info("graft_rolling_hash",
        "Karp-Rabin rolling hash over a text column's code points"),
      (args: Seq[Expression]) => RollingHash(args.head)),
    ("graft_lang_id",
      info("graft_lang_id",
        "heuristic function-word language ID (en/de/fr/es/unknown)"),
      (args: Seq[Expression]) => LangId(args.head)))

  /** [[register]] at most once per session — the idempotent form library
    * code calls internally (plain register logs a "replaced function"
    * warning per call).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("graft_minhash_sig")))
      // expressions only: the UDF helpers need Scala-lambda reflection,
      // which fails in REPL-loader environments and is not needed by
      // library internals (they resolve call_function against `all`)
      all.foreach { case (name, i, builder) =>
        spark.sessionState.functionRegistry
          .registerFunction(FunctionIdentifier(name), i, builder)
      }

  /** Register the expression-backed functions plus the UDF-backed parse
    * helpers on a live session.
    */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
    // non-expressible helpers go through the regular UDF registry
    spark.udf.register("graft_repair_json",
      (s: String) => graft.functions.ParseFunctions.repairJsonS(s))
    spark.udf.register("graft_parse_fallback",
      (s: String) => graft.functions.ParseFunctions.parseFallbackS(s))
  }
}
