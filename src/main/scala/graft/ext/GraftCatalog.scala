package graft.ext

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics => V2Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwriteV2, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The SQL DDL/DML face of [[ManifestTable]] — a DataSource V2
  * `TableCatalog` (VERDICT r13 order #1), so the table layer works from
  * plain `spark.sql`:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.ext.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/wh")
  *   spark.sql("CREATE TABLE graft.docs (id BIGINT, lang STRING) PARTITIONED BY (lang)")
  *   spark.sql("INSERT INTO graft.docs VALUES (1, 'de')")
  *   spark.sql("SELECT * FROM graft.docs WHERE lang = 'de'")
  *   spark.sql("DELETE FROM graft.docs WHERE id = 1")
  *   spark.sql("SELECT * FROM graft.docs VERSION AS OF 2")
  * }}}
  *
  * An identifier `graft.a.b.t` maps to the directory `<warehouse>/a/b/t`
  * — namespaces are directories, a table is a directory holding a
  * `_manifest/` log, exactly the layout every Scala-API caller already
  * uses, so SQL and Scala callers interoperate on the SAME tables.
  *
  * Reads resolve to [[GraftTableV2]], whose relations
  * [[graft.plans.GraftExtensions]] converts to the planner-integrated
  * [[ManifestFileIndex]] scan (FileSourceScanExec: stats+bloom file
  * pruning, vectorized parquet, whole-stage codegen). Without the
  * extension the table still answers through its V1Scan fallback —
  * correct and filter-pruned, minus the codegen'd scan node.
  *
  * Writes go through the V1 write bridge: `INSERT INTO` appends a batch
  * (stats, blooms, constraints, partition layout — indistinguishable
  * from a Scala append), `INSERT OVERWRITE` maps to
  * [[ManifestTable.overwriteWhere]] (one atomic replace commit), and
  * `DELETE FROM ... WHERE` maps to [[ManifestTable.deleteWhere]] — the
  * same metadata-or-CoW row-level delete, file-pruned, so a partition
  * drop stays a manifest-only commit at any scale.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with StagingTableCatalog {

  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.warehouse"))
      .stripSuffix("/")
  }

  override def name(): String = catName

  // column DEFAULT values: the analyzer substitutes them into INSERTs
  // at analysis time (rows store REAL values); the default SQL rides
  // the recorded schema's field metadata — see
  // [[ManifestTable.setColumnDefault]].
  // table CONSTRAINTs: `ALTER TABLE ... ADD CONSTRAINT ck CHECK (...)`
  // lowers through alterTable to [[ManifestTable.addConstraint]] — the
  // same existing-rows-validated, append-enforced CHECK every Scala
  // caller gets
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      // GENERATED ALWAYS AS: Spark validates the expression at CREATE
      // (deterministic, non-generated references only) and ships it in
      // the schema's field metadata; the manifest enforces it at every
      // write seam (ManifestTable fillGenerated/recomputeGenerated and
      // the synthetic <=> check)
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      // GENERATED [ALWAYS | BY DEFAULT] AS IDENTITY: the spec rides the
      // field metadata, the high-water mark is a versioned table
      // property, minting is append-side with conflict-rebase — see
      // ManifestTable.fillIdentity
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  private def spark: SparkSession = SparkSession.active

  private def fs(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dirOf(ident: Identifier): String =
    (warehouse +: (ident.namespace() :+ ident.name()).toSeq).mkString("/")

  private def nsDir(namespace: Array[String]): String =
    (warehouse +: namespace.toSeq).mkString("/")

  // -------------------------------------------------------------- tables

  override def tableExists(ident: Identifier): Boolean =
    ManifestTable.exists(spark, dirOf(ident))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident))
      return metaTable(ident).getOrElse(throw new NoSuchTableException(ident))
    new GraftTableV2(spark, dirOf(ident),
      (catName +: (ident.namespace() :+ ident.name()).toSeq).mkString("."),
      pinned = None)
  }

  /** Iceberg-style SQL metadata faces: `SELECT * FROM <cat>.<t>.history`
    * (also `files`, `partitions`, `detail`, `ndv`) — the identifier's
    * namespace tail names an EXISTING table and the name selects the
    * face. A real table always wins the name (checked first above);
    * the faces are read-only, current-snapshot, manifest-math-only
    * relations — no data file opens at any scale.
    */
  private def metaTable(ident: Identifier): Option[Table] = {
    val face = ident.name().toLowerCase(java.util.Locale.ROOT)
    if (!GraftMetaTable.faces.contains(face) || ident.namespace().isEmpty)
      return None
    val parent = Identifier.of(ident.namespace().dropRight(1),
      ident.namespace().last)
    if (!tableExists(parent)) None
    else Some(new GraftMetaTable(spark, dirOf(parent),
      (catName +: (ident.namespace() :+ ident.name()).toSeq).mkString("."),
      face))
  }

  /** SQL time travel: `VERSION AS OF <v>` — the loaded table pins the
    * named manifest version (reads only; a pinned table refuses writes
    * upstream in Spark). A non-numeric version is a TAG
    * (`VERSION AS OF 'release-1'`), resolved through the table's
    * `graft.tag.<name>` properties — expiry and vacuum keep tagged
    * snapshots resolvable whatever the retention settings.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = version.toLongOption.getOrElse {
      val snap = ManifestTable.snapshot(spark, dirOf(ident))
      ManifestTable.tags(snap).getOrElse(version,
        throw new IllegalArgumentException(
          s"table ${ident.name()} has no version or tag '$version' " +
            s"(tags: ${ManifestTable.tags(snap).keys.toSeq.sorted
              .mkString(", ")})"))
    }
    new GraftTableV2(spark, dirOf(ident),
      (catName +: (ident.namespace() :+ ident.name()).toSeq).mkString("."),
      pinned = Some(v))
  }

  /** SQL time travel: `TIMESTAMP AS OF <ts>` (Spark hands micros). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = ManifestTable.versionAt(spark, dirOf(ident), timestamp / 1000L)
    new GraftTableV2(spark, dirOf(ident),
      (catName +: (ident.namespace() :+ ident.name()).toSeq).mkString("."),
      pinned = Some(v))
  }

  /** The TableInfo entry point Spark actually calls (the older
    * overloads delegate to it in REVERSE here): a `CREATE TABLE` with
    * inline `CONSTRAINT ... CHECK (...)` applies them through
    * [[ManifestTable.addConstraint]] right after the create — without
    * this override the default delegation DROPPED them silently, the
    * exact quiet-lie failure the engine exists to refuse.
    */
  override def createTable(ident: Identifier,
                           info: org.apache.spark.sql.connector.catalog.TableInfo)
  : Table = {
    // validate EVERY constraint before the create commits — a rejection
    // after it would strand an orphan table the rerun then collides with
    val checks = info.constraints().map {
      case ck: org.apache.spark.sql.connector.catalog.constraints.Check =>
        val parsed = spark.sessionState.sqlParser
          .parseExpression(ck.predicateSql())
        parsed.collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.nameParts.head
        }.foreach(c => require(
          info.schema().fields.exists(_.name.equalsIgnoreCase(c)),
          s"CHECK constraint ${ck.name()} references column $c, which " +
            "the table does not declare"))
        ck.name() -> ck.predicateSql()
      case other => throw new UnsupportedOperationException(
        s"graft-manifest tables enforce CHECK constraints only; " +
          s"'${other.name()}' is ${other.getClass.getSimpleName}")
    }
    // GENERATED ALWAYS AS rides only the V2 Column (info.schema()'s
    // conversion DROPS generationExpression) — re-attach it to the
    // recorded schema's field metadata under Spark's own key, after a
    // reference check mirroring the constraint one above (Spark's
    // analysis already validated determinism and non-generated refs)
    val schema = StructType(info.schema().fields.zip(info.columns())
      .map { case (fd, c) =>
        Option(c.generationExpression()).filter(_.nonEmpty) match {
          case Some(gen) =>
            spark.sessionState.sqlParser.parseExpression(gen).collect {
              case a: org.apache.spark.sql.catalyst.analysis
                  .UnresolvedAttribute => a.nameParts.head
            }.foreach(rc => require(
              info.schema().fields.exists(_.name.equalsIgnoreCase(rc)),
              s"generated column ${fd.name} references column $rc, " +
                "which the table does not declare"))
            fd.copy(metadata =
              new org.apache.spark.sql.types.MetadataBuilder()
                .withMetadata(fd.metadata)
                .putString(org.apache.spark.sql.catalyst.util
                  .GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY, gen)
                .build())
          case None => Option(c.identityColumnSpec()) match {
            // IDENTITY spec rides the field metadata under Spark's own
            // keys (the schema conversion drops it, like generation)
            case Some(ispec) =>
              require(fd.dataType ==
                  org.apache.spark.sql.types.LongType,
                s"identity column ${fd.name} must be BIGINT " +
                  s"(got ${fd.dataType.simpleString}) — minted ranges " +
                  "are 64-bit")
              require(ispec.getStep != 0L,
                s"identity column ${fd.name} needs a non-zero step")
              fd.copy(metadata =
                new org.apache.spark.sql.types.MetadataBuilder()
                  .withMetadata(fd.metadata)
                  .putLong(org.apache.spark.sql.catalyst.util
                    .IdentityColumn.IDENTITY_INFO_START, ispec.getStart)
                  .putLong(org.apache.spark.sql.catalyst.util
                    .IdentityColumn.IDENTITY_INFO_STEP, ispec.getStep)
                  .putBoolean(org.apache.spark.sql.catalyst.util
                    .IdentityColumn.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT,
                    ispec.isAllowExplicitInsert)
                  .build())
            case None => fd
          }
        }
      })
    val t = createTable(ident, schema, info.partitions(),
      info.properties())
    checks.foreach { case (n, sql) =>
      ManifestTable.addConstraint(spark, dirOf(ident), n, sql) }
    if (checks.nonEmpty) loadTable(ident) else t
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    ManifestTable.create(spark, dirOf(ident), schema,
      identityPartCols(partitions))
    // TBLPROPERTIES travel to the manifest — minus the entries Spark
    // itself injects into every V2 create (provider/location/owner/...)
    val up = userProps(properties)
    if (up.nonEmpty)
      ManifestTable.setProperties(spark, dirOf(ident), up)
    loadTable(ident)
  }

  /** Schema evolution as metadata commits, all through the manifest's
    * column mapping ([[ManifestTable.renameColumn]] etc.):
    *
    *   - `ADD COLUMN`: forced nullable, old files null-fill — or
    *     read-fill the FROZEN literal when the ADD declares a DEFAULT
    *     (the EXISTS_DEFAULT/CURRENT_DEFAULT two-field protocol, see
    *     [[ManifestTable.addColumn]]); re-adding a previously dropped
    *     name binds a FRESH physical slot;
    *   - `RENAME COLUMN`: logical name changes, physical parquet name
    *     stays — no rewrite, stats/blooms/NDV keep pruning;
    *   - `DROP COLUMN`: logical column gone, physical name retired so
    *     its bytes can never resurface under a later ADD.
    *
    *   - `ALTER COLUMN ... TYPE`: WIDENING within a stats family only
    *     (byte→short→int→long, float→double — see
    *     [[ManifestTable.widenColumnType]]); anything else is a loud
    *     error, the same rule the append path enforces;
    *   - `ALTER COLUMN ... SET / DROP NOT NULL`: DROP is metadata-only;
    *     SET validates existing rows first (one aggregate) — see
    *     [[ManifestTable.setColumnNullability]];
    *   - `ALTER COLUMN ... COMMENT`: field-metadata commit, surfaced by
    *     DESCRIBE ([[ManifestTable.setColumnComment]]).
    *
    * Partition columns cannot be renamed or dropped.
    */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    // group the property changes into ONE metadata commit each way
    val sets = changes.collect {
      case s: TableChange.SetProperty => s.property() -> s.value()
    }
    val unsets = changes.collect {
      case r: TableChange.RemoveProperty => r.property()
    }
    def topLevel(what: String, fieldNames: Array[String]): String = {
      require(fieldNames.length == 1,
        s"graft-manifest supports top-level $what only, got " +
          fieldNames.mkString("."))
      fieldNames(0)
    }
    changes.foreach {
      case add: TableChange.AddColumn =>
        // ADD COLUMN ... DEFAULT: Delta's two-field protocol.
        // CURRENT_DEFAULT keeps the declared SQL (future INSERTs);
        // EXISTS_DEFAULT freezes the value the ANALYZER already
        // evaluated to a literal (ColumnDefaultValue.getValue — so
        // current_date() is pinned to the ALTER's date) and read-fills
        // the pre-ADD files. Both ride the recorded schema's field
        // metadata; no data moves.
        val default = Option(add.defaultValue()).map { d =>
          val lv = d.getValue()
          require(lv != null,
            s"ADD COLUMN ${add.fieldNames().mkString(".")}: the DEFAULT " +
              "did not fold to a literal — only constant defaults can " +
              "read-fill existing rows")
          val lit = org.apache.spark.sql.catalyst.expressions.Literal(
            lv.value(), lv.dataType())
          val cur = Option(d.getSql()).filter(_.nonEmpty).getOrElse(lit.sql)
          (cur, lit.sql)
        }
        ManifestTable.addColumn(spark, dirOf(ident),
          topLevel("ADD COLUMN", add.fieldNames()), add.dataType(), default)
      case ren: TableChange.RenameColumn =>
        ManifestTable.renameColumn(spark, dirOf(ident),
          topLevel("RENAME COLUMN", ren.fieldNames()), ren.newName())
      case del: TableChange.DeleteColumn =>
        ManifestTable.dropColumn(spark, dirOf(ident),
          topLevel("DROP COLUMN", del.fieldNames()))
      case w: TableChange.UpdateColumnType =>
        ManifestTable.widenColumnType(spark, dirOf(ident),
          topLevel("ALTER COLUMN TYPE", w.fieldNames()), w.newDataType())
      case nn: TableChange.UpdateColumnNullability =>
        ManifestTable.setColumnNullability(spark, dirOf(ident),
          topLevel("ALTER COLUMN NULLABILITY", nn.fieldNames()),
          nn.nullable())
      case dv: TableChange.UpdateColumnDefaultValue =>
        ManifestTable.setColumnDefault(spark, dirOf(ident),
          topLevel("ALTER COLUMN DEFAULT", dv.fieldNames()),
          Option(dv.newDefaultValue()).filter(_.nonEmpty))
      case ac: TableChange.AddConstraint =>
        ac.constraint() match {
          case ck: org.apache.spark.sql.connector.catalog.constraints.Check =>
            ManifestTable.addConstraint(spark, dirOf(ident),
              ck.name(), ck.predicateSql())
          case other => throw new UnsupportedOperationException(
            s"graft-manifest tables enforce CHECK constraints only; " +
              s"'${other.name()}' is ${other.getClass.getSimpleName} — " +
              "UNIQUE/PRIMARY KEY/FOREIGN KEY are unenforced metadata " +
              "in Spark and this engine refuses to record what it " +
              "cannot honor")
        }
      case dc: TableChange.DropConstraint =>
        val dropped = ManifestTable.dropConstraint(spark, dirOf(ident),
          dc.name())
        if (!dropped && !dc.ifExists())
          throw new IllegalArgumentException(
            s"table ${ident.name()} has no constraint '${dc.name()}'")
      case cm: TableChange.UpdateColumnComment =>
        ManifestTable.setColumnComment(spark, dirOf(ident),
          topLevel("ALTER COLUMN COMMENT", cm.fieldNames()),
          Option(cm.newComment()).filter(_.nonEmpty))
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => ()
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change $other is not supported on graft-manifest " +
          "tables; ADD/RENAME/DROP COLUMN evolve the schema (constraints " +
          "go through ManifestTable.addConstraint/dropConstraint)")
    }
    if (sets.nonEmpty)
      ManifestTable.setProperties(spark, dirOf(ident), sets.toMap)
    if (unsets.nonEmpty)
      ManifestTable.unsetProperties(spark, dirOf(ident), unsets)
    loadTable(ident)
  }

  /** Identity partition columns from V2 transforms (bucketing and
    * friends are a compaction policy here, not a write layout).
    */
  private def identityPartCols(partitions: Array[Transform]): Seq[String] =
    partitions.toSeq.map { t =>
      org.apache.spark.sql.graft.GraftSqlShims.identityColumn(t).getOrElse(
        throw new UnsupportedOperationException(
          s"graft-manifest tables partition by column identity only " +
            s"(got transform $t); bucketing/clustering is a compaction " +
            "policy (compact clusterBy/zorder), not a write layout"))
    }

  /** TBLPROPERTIES minus the entries Spark injects into every V2
    * create/replace (provider/location/owner/...).
    */
  private def userProps(properties: util.Map[String, String])
  : Map[String, String] =
    properties.asScala.toMap -- Seq(
      TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_EXTERNAL,
      TableCatalog.PROP_IS_MANAGED_LOCATION, TableCatalog.PROP_COMMENT)

  // ------------------------------------------------- atomic REPLACE
  //
  // Without this seam Spark lowers [CREATE OR] REPLACE TABLE on a V2
  // catalog to DROP + CREATE: destructive (the manifest log and its
  // time travel are erased) and non-atomic (a crash between the two
  // strands a missing table). The staging seam routes all three verbs
  // to ManifestTable.replaceTable — ONE commit that swaps definition
  // and contents together while the history survives: time travel
  // still answers below the replace, restore can undo it, and the CDC
  // feed spans it as a synthesized snapshot diff.

  // the staged (CTAS/RTAS) paths cannot honor inline constraints
  // atomically — the AS-SELECT data lands in the same commit the
  // constraint would have to pre-validate — so they refuse loudly
  // instead of dropping them; create-then-ALTER is the supported shape
  private def rejectStagedConstraints(
      info: org.apache.spark.sql.connector.catalog.TableInfo,
      what: String): Unit =
    require(info.constraints().isEmpty,
      s"inline CONSTRAINTs are not supported on $what — run the " +
        "statement without them, then ALTER TABLE ... ADD CONSTRAINT " +
        "(which validates the landed rows)")

  override def stageCreate(ident: Identifier,
                           info: org.apache.spark.sql.connector.catalog.TableInfo)
  : StagedTable = {
    rejectStagedConstraints(info, "CREATE TABLE ... AS SELECT")
    stageCreate(ident, info.schema(), info.partitions(), info.properties())
  }

  override def stageReplace(ident: Identifier,
                            info: org.apache.spark.sql.connector.catalog.TableInfo)
  : StagedTable = {
    rejectStagedConstraints(info, "REPLACE TABLE")
    stageReplace(ident, info.schema(), info.partitions(), info.properties())
  }

  override def stageCreateOrReplace(ident: Identifier,
                                    info: org.apache.spark.sql.connector.catalog.TableInfo)
  : StagedTable = {
    rejectStagedConstraints(info, "CREATE OR REPLACE TABLE")
    stageCreateOrReplace(ident, info.schema(), info.partitions(),
      info.properties())
  }

  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    new StagedGraftTable(spark, dirOf(ident), ident, schema,
      identityPartCols(partitions), userProps(properties),
      mustExist = false, mayExist = false)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: util.Map[String, String]): StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new StagedGraftTable(spark, dirOf(ident), ident, schema,
      identityPartCols(partitions), userProps(properties),
      mustExist = true, mayExist = true)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: util.Map[String, String]): StagedTable =
    new StagedGraftTable(spark, dirOf(ident), ident, schema,
      identityPartCols(partitions), userProps(properties),
      mustExist = false, mayExist = true)

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && fs(dirOf(ident))
      .delete(new Path(dirOf(ident)), true)

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    // a data-file-relative format relocates freely: nothing in the
    // manifest records an absolute path
    require(fs(dirOf(from)).rename(new Path(dirOf(from)),
      new Path(dirOf(to))), s"rename $from -> $to failed")
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = new Path(nsDir(namespace))
    val f = fs(nsDir(namespace))
    if (!f.exists(d)) {
      if (namespace.isEmpty) return Array.empty
      throw new NoSuchNamespaceException(namespace)
    }
    f.listStatus(d).iterator.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => ManifestTable.exists(spark, s"${nsDir(namespace)}/$n"))
      .map(n => Identifier.of(namespace, n)).toArray
  }

  // ---------------------------------------------------------- procedures

  /** SQL `CALL <catalog>.system.<proc>(table => 'ns.t', ...)` — the
    * maintenance verbs as stored procedures (see [[GraftProcedures]]).
    */
  override def loadProcedure(ident: Identifier)
  : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(catName, parts => dirOf(
      Identifier.of(parts.dropRight(1).toArray, parts.last)), ident)

  override def listProcedures(namespace: Array[String])
  : Array[Identifier] =
    // the empty namespace is the catalog-wide listing (SHOW PROCEDURES
    // IN <catalog>) — the system procedures are all there are
    if (namespace.isEmpty || namespace.toSeq == Seq("system"))
      GraftProcedures.identifiers
    else Array.empty

  // ---------------------------------------------------------- namespaces

  override def defaultNamespace(): Array[String] = Array.empty

  private def isNamespaceDir(path: String): Boolean =
    fs(path).exists(new Path(path)) && !ManifestTable.exists(spark, path)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || isNamespaceDir(nsDir(namespace))

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String])
  : Array[Array[String]] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    val d = new Path(nsDir(namespace))
    val f = fs(nsDir(namespace))
    if (!f.exists(d)) Array.empty
    else f.listStatus(d).iterator.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => ManifestTable.exists(spark, s"${nsDir(namespace)}/$n"))
      .map(n => namespace :+ n).toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String])
  : util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Map("location" -> nsDir(namespace)).asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    fs(nsDir(namespace)).mkdirs(new Path(nsDir(namespace)))

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces are directories; they carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    if (!cascade)
      require(listTables(namespace).isEmpty &&
        listNamespaces(namespace).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty")
    fs(nsDir(namespace)).delete(new Path(nsDir(namespace)), true)
  }
}

/** One manifest table through the DSv2 `Table` seam (see
  * [[GraftCatalog]]). The snapshot pins at table LOAD — one SQL
  * statement sees one manifest version, the same swap isolation every
  * other read path gives — and `pinned` carries SQL time travel.
  *
  * Reads: [[graft.plans.GraftExtensions]] rewrites this table's
  * relations to [[ManifestPlan.dataFrame]] (FileIndex-pruned,
  * DV-aware); [[GraftScanBuilder]] is the self-contained V1Scan
  * fallback for sessions without the extension. Writes:
  * [[GraftWriteBuilder]] (V1 bridge). Deletes: `SupportsDeleteV2`,
  * translated to predicate SQL — Spark only routes a DELETE here when
  * every conjunct translates, so a dropped filter can never widen one.
  */
class GraftTableV2(spark: SparkSession, val dir: String, ident: String,
                   val pinned: Option[Long]) extends Table
    with SupportsRead with SupportsWrite with SupportsDeleteV2
    with org.apache.spark.sql.graft.GraftV1FallbackTable {

  /** Resolved once per catalog load (= per SQL statement). */
  lazy val snap: ManifestTable.Snapshot =
    pinned.fold(ManifestTable.snapshot(spark, dir))(v =>
      ManifestTable.snapshotAt(spark, dir, v))

  override def name(): String = ident

  override def schema(): StructType = ManifestPlan.schemaOf(spark, dir, snap)

  override def partitioning(): Array[Transform] =
    snap.partitionCols.map(c => Expressions.identity(c)).toArray

  override def properties(): util.Map[String, String] =
    (snap.properties ++ Map("location" -> dir,
      "provider" -> "graft-manifest",
      "version" -> snap.version.toString)).asJava

  // surface the manifest's CHECK constraints on the V2 face (DESCRIBE
  // EXTENDED, SHOW CREATE, engine introspection): enforced + validated
  // is the literal truth — addConstraint validated existing rows and
  // every append re-checks
  override def constraints()
  : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    snap.constraints.toSeq.sortBy(_._1).map { case (n, e) =>
      org.apache.spark.sql.connector.catalog.constraints.Constraint
        .check(n).predicateSql(e).enforced(true)
        .validationStatus(org.apache.spark.sql.connector.catalog
          .constraints.Constraint.ValidationStatus.VALID)
        .build(): org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray

  // AUTOMATIC_SCHEMA_EVOLUTION lets the analyzer's own
  // ResolveMergeIntoSchemaEvolution serve `MERGE ... WITH SCHEMA
  // EVOLUTION`: it computes the source-new columns and calls
  // alterTable(AddColumn)/alterTable(UpdateColumnType) — the same
  // metadata commits ALTER TABLE makes (nullable adds, family-widening
  // only, anything else a loud error) — then re-resolves the merge
  // against the evolved schema and GraftDmlRule lowers it as usual.
  // KNOWN CONTRACT of Spark's capability (not this engine's choice):
  // the ALTER commits at ANALYSIS time, so a merge that later fails —
  // or is merely EXPLAINed — leaves the evolved column behind. The
  // residue is benign (nullable, empty, visible as its own `metadata`
  // commit in history, removable with DROP COLUMN) and is spec-pinned
  // rather than papered over.
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  /** The DV-aware, FileIndex-pruned read plan (what the extension's
    * conversion rule swaps in for this table's relations).
    */
  def readDataFrame(session: SparkSession): DataFrame =
    ManifestPlan.dataFrame(session, dir, snap)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
  : ScanBuilder = new GraftScanBuilder(spark, dir, snap, schema())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinned.isEmpty,
      s"cannot write to a time-travel pinned version of $ident")
    new GraftWriteBuilder(dir, ident)
  }

  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    deleteSql(predicates).isDefined

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    val sql = deleteSql(predicates).getOrElse(throw
      new UnsupportedOperationException(
        s"DELETE predicate not translatable: ${predicates.mkString(", ")}"))
    val opId = s"sql-delete-${java.util.UUID.randomUUID()}"
    ManifestTable.retryOnConflict(spark, dir, opId) {
      // cdc recomputed INSIDE the retried closure from the fresh head
      // (not the table's load-time snapshot) — a change-feed property
      // toggled concurrently must not mis-record CDC on a rebased
      // delete; same contract as the SQL command paths
      ManifestTable.deleteWhere(spark, dir, sql, opId,
        cdc = ManifestTable.changeFeedEnabled(
          ManifestTable.snapshot(spark, dir)))
    }
  }

  private def deleteSql(predicates: Array[Predicate]): Option[String] = {
    val v1 = predicates.toSeq.map(org.apache.spark.sql.graft.GraftSqlShims.predicateToV1)
    if (v1.exists(_.isEmpty)) None
    else FilterSql.conjunctionSql(v1.flatten)
  }

  /** The V1 face Spark's STREAMING seams fall back to (the trait is
    * only consulted on streaming paths — batch resolution ignores it):
    * `df.writeStream.format("graft-manifest").toTable("cat.t")` routes
    * here, starting the [[ManifestSink]] at the table's directory — the
    * manifest append path, so the table's recorded partition layout,
    * constraints, stats and blooms all apply, and a replayed micro-batch
    * is absorbed by batch-id idempotence exactly like the path API.
    * (A `toTable` without `.format("graft-manifest")` raises Spark's
    * provider-mismatch error naming the required format — loud, never a
    * silent parquet write into the warehouse.)
    */
  override def v1Table: org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    val parts = ident.split("\\.").toSeq
    org.apache.spark.sql.catalyst.catalog.CatalogTable(
      identifier = org.apache.spark.sql.catalyst.TableIdentifier(
        parts.last,
        if (parts.size > 1) Some(parts(parts.size - 2)) else None,
        if (parts.size > 2) Some(parts.head) else None),
      tableType =
        org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL,
      storage = org.apache.spark.sql.catalyst.catalog.CatalogStorageFormat
        .empty.copy(locationUri = Some(new Path(dir).toUri)),
      schema = schema(),
      provider = Some("graft-manifest"))
  }

  override def toString: String = s"GraftTableV2($ident)"
}

/** The self-contained DSv2 read path (no session extension required):
  * pushed filters translate to predicate SQL and pre-filter
  * [[ManifestPlan.dataFrame]] — so file pruning via the clean branch's
  * [[ManifestFileIndex]] still happens — while every filter is ALSO
  * reported unhandled, so Spark re-applies them above (a filter the
  * translation drops only widens the scan). Column pruning projects
  * before the collect into the V1 RDD.
  */
class GraftScanBuilder(spark: SparkSession, dir: String,
                       snap: ManifestTable.Snapshot,
                       tableSchema: StructType) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushedSql: Option[String] = None
  private var required: StructType = tableSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val translatable = filters.toSeq.filter(f => FilterSql.toSql(f).isDefined)
    pushedSql = FilterSql.conjunctionSql(translatable)
      .filter(_ => translatable.nonEmpty)
    filters // all residual: Spark re-applies exactly, we prune only
  }

  override def pushedFilters(): Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Manifest-honest table statistics for the V2 seam: recorded file
    * bytes scaled by the DV-visible row fraction (the
    * [[ManifestTable.metaCount]] math) plus the exact visible row
    * count. Without this, Spark sizes the fallback relation at
    * `defaultSizeInBytes` (effectively infinite) and a small graft
    * dimension NEVER broadcasts in an extension-less session; with it,
    * the optimizer's own threshold logic decides — no hints needed.
    * Empty optionals when any live file lacks recorded size/stats
    * (never guess a size the planner will trust).
    */
  def estimateStatistics(): V2Statistics = new V2Statistics {
    private val known = snap.files.forall(f =>
      snap.sizes.contains(f) && snap.stats.contains(f))
    private val rawBytes = if (known) snap.files.map(snap.sizes).sum else 0L
    private val totalRows =
      if (known) snap.files.map(f => snap.stats(f).rows).sum else 0L
    private val deleted = snap.dvs.valuesIterator.flatten.map(_.rows).sum
    override def sizeInBytes(): java.util.OptionalLong =
      if (!known) java.util.OptionalLong.empty()
      else if (totalRows <= 0L) java.util.OptionalLong.of(rawBytes)
      else java.util.OptionalLong.of(
        (rawBytes.toDouble * (totalRows - deleted) / totalRows).toLong)
    override def numRows(): java.util.OptionalLong =
      if (!known) java.util.OptionalLong.empty()
      else java.util.OptionalLong.of(totalRows - deleted)
  }

  override def build(): Scan = new V1Scan with SupportsReportStatistics {
    override def estimateStatistics(): V2Statistics =
      GraftScanBuilder.this.estimateStatistics()
    override def readSchema(): StructType = required
    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: SQLContext): T = {
      val (sql, req) = (pushedSql, required)
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = req
        override def buildScan()
        : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
          val base = ManifestPlan.dataFrame(context.sparkSession, dir, snap)
          val filtered = sql.fold(base)(base.where)
          filtered.select(req.fieldNames.toSeq
            .map(org.apache.spark.sql.functions.col): _*).rdd
        }
      }.asInstanceOf[T]
    }
  }
}

/** A METADATA FACE of a manifest table as a DSv2 relation —
  * `SELECT * FROM <cat>.<t>.<face>` for operational SQL reads:
  *
  *   - `history`: the commit log ([[ManifestTable.history]]);
  *   - `partitions`: live partition tuples + per-partition file/row
  *     counts ([[ManifestTable.partitions]]);
  *   - `detail`: the one-row operational summary
  *     ([[ManifestTable.detail]]);
  *   - `files`: one row per live data file — name, recorded bytes,
  *     recorded rows, partition tuple, outstanding DV-deleted rows —
  *     straight from the snapshot;
  *   - `ndv`: the per-column distinct-count estimates from the
  *     manifest's HLL sketches ([[ManifestTable.metaNdv]]).
  *
  * Every face is answered from manifest math alone — a 100 TB table's
  * `files` face reads the manifest log, never a data byte. Read-only
  * (no SupportsWrite), current-snapshot (operational views, not
  * time-travel surfaces), and served through the V1Scan seam: the
  * frames are O(files)/O(commits) small, so the planner-integrated
  * FileIndex path would be overkill.
  */
class GraftMetaTable(spark: SparkSession, dir: String, ident: String,
                     face: String) extends Table with SupportsRead {

  import org.apache.spark.sql.DataFrame

  private def frame(session: SparkSession): DataFrame =
    GraftMetaTable.frameOf(session, dir, face)

  override def name(): String = ident

  override def schema(): StructType = frame(spark).schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
  : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new V1Scan {
      override def readSchema(): StructType = GraftMetaTable.this.schema()
      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T =
        new BaseRelation with TableScan {
          override def sqlContext: SQLContext = context
          override def schema: StructType = GraftMetaTable.this.schema()
          override def buildScan()
          : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
            frame(context.sparkSession).rdd
        }.asInstanceOf[T]
    }
  }

  override def toString: String = s"GraftMetaTable($ident)"
}

object GraftMetaTable {

  val faces: Set[String] = Set("history", "files", "partitions", "detail",
    "ndv")

  def frameOf(session: SparkSession, dir: String,
              face: String): org.apache.spark.sql.DataFrame = face match {
    case "history" => ManifestTable.history(session, dir)
    case "partitions" => ManifestTable.partitions(session, dir)
    case "detail" => ManifestTable.detail(session, dir)
    case "ndv" =>
      import session.implicits._
      ManifestTable.metaNdv(session, dir).toSeq.sortBy(_._1)
        .toDF("column", "ndv")
    case "files" =>
      import session.implicits._
      val snap = ManifestTable.snapshot(session, dir)
      snap.files.sorted.map { f =>
        (f, snap.sizes.get(f), snap.stats.get(f).map(_.rows),
          snap.pvals.getOrElse(f, Map.empty)
            .map { case (c, pv) => c -> pv.value.orNull },
          snap.dvs.getOrElse(f, Nil).map(_.rows).sum)
      }.toDF("file", "bytes", "rows", "partition", "dv_deleted_rows")
    case other => throw new IllegalArgumentException(
      s"unknown metadata face $other (available: ${faces.mkString(", ")})")
  }
}

/** The V1 write bridge: `INSERT INTO` → [[ManifestTable.append]] under
  * a fresh `sql-insert-*` batch id; `INSERT OVERWRITE` (truncate or
  * filtered) → [[ManifestTable.overwriteWhere]] — one atomic
  * replace-commit, file-pruned by the predicate, refusing replacement
  * rows that violate it (replaceWhere). The append path carries the
  * whole table contract — stats, blooms, CHECK constraints, declared
  * partition layout — so a SQL-written table is indistinguishable from
  * a Scala-written one.
  */
/** The in-flight handle behind the catalog's atomic
  * `[CREATE OR] REPLACE TABLE [AS SELECT]` (see
  * [[GraftCatalog.stageReplace]]): Spark writes the AS-SELECT batch
  * into it (V1 bridge — the frame is only REMEMBERED here) and then
  * calls `commitStagedChanges`, which runs
  * [[ManifestTable.replaceTable]] — staging the data invisibly and
  * swapping definition + contents in ONE manifest commit. Nothing is
  * visible, or even written, before the commit call, so
  * `abortStagedChanges` has nothing to undo.
  */
class StagedGraftTable(spark: SparkSession, dir: String, ident: Identifier,
                       newSchema: StructType, partCols: Seq[String],
                       props: Map[String, String],
                       mustExist: Boolean, mayExist: Boolean)
    extends StagedTable with SupportsWrite {

  @volatile private var staged: Option[DataFrame] = None

  override def name(): String = ident.toString

  override def schema(): StructType = newSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsOverwriteV2 {
      // an RTAS write arrives as overwrite-by-truncate: accepted and
      // DISCARDED — a replace's contents are, by definition, exactly
      // the staged frame; there is nothing narrower to overwrite
      override def truncate(): WriteBuilder = this
      override def canOverwrite(predicates: Array[Predicate]): Boolean = true
      override def overwrite(predicates: Array[Predicate]): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit =
              staged = Some(data)
          }
      }
    }

  override def commitStagedChanges(): Unit =
    ManifestTable.replaceTable(spark, dir, staged, newSchema, partCols,
      props, s"sql-replace-${java.util.UUID.randomUUID()}",
      mustExist = mustExist, mayExist = mayExist)

  override def abortStagedChanges(): Unit = () // nothing written yet
}

class GraftWriteBuilder(dir: String, ident: String) extends WriteBuilder
    with SupportsOverwriteV2 {

  private var overwriteSql: Option[String] = None

  override def truncate(): WriteBuilder = { overwriteSql = Some("true"); this }

  override def canOverwrite(predicates: Array[Predicate]): Boolean = {
    val v1 = predicates.toSeq.map(org.apache.spark.sql.graft.GraftSqlShims.predicateToV1)
    !v1.exists(_.isEmpty) && FilterSql.conjunctionSql(v1.flatten).isDefined
  }

  override def overwrite(predicates: Array[Predicate]): WriteBuilder = {
    val v1 = predicates.toSeq.map(org.apache.spark.sql.graft.GraftSqlShims.predicateToV1)
    overwriteSql = FilterSql.conjunctionSql(
      v1.map(_.getOrElse(throw new UnsupportedOperationException(
        s"INSERT OVERWRITE predicate not translatable on $ident"))))
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit =
          overwriteSql match {
            case Some(pred) =>
              ManifestTable.overwriteWhere(data, dir, pred,
                s"sql-overwrite-${java.util.UUID.randomUUID()}")
            case None =>
              ManifestTable.append(data, dir,
                s"sql-insert-${java.util.UUID.randomUUID()}")
          }
      }
  }
}
