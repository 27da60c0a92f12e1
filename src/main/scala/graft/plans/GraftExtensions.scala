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
    e.injectPostHocResolutionRule(session => new GraftV2Reads(session))
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
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, Project, V2WriteCommand}
  import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
  import org.apache.spark.sql.execution.datasources.DataSource
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
  import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation

  private def convert(plan: LogicalPlan): LogicalPlan = plan match {
    case w: V2WriteCommand => w.withNewQuery(convert(w.query))
    case i: InsertIntoStatement => i.copy(query = convert(i.query))
    case d: DeleteFromTable => d
    // `spark.readStream.table("cat.t")` — the catalog table as a
    // STREAM. The V2 table deliberately does not claim
    // MICRO_BATCH_READ (a V2 MicroBatchStream would re-implement the
    // per-file read loop Spark's parquet relation already does well);
    // instead the streaming relation rewrites to the graft-manifest V1
    // source — version-offset micro-batches over exactly the appended
    // files, reader options (`readChangeFeed`, `sinceVersion`,
    // `sinceTimestamp`, `maxVersionsPerTrigger`) passing through
    // verbatim. Same move as the batch conversion below, same
    // authority: the table's manifest, resolved per micro-batch.
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
      val v1 = t.readDataFrame(session).queryExecution.analyzed
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
