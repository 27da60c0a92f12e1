package graft.ext

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The SQL maintenance face of [[ManifestTable]] — DSv2 stored
  * procedures (`ProcedureCatalog`), Iceberg's `CALL` idiom:
  *
  * {{{
  *   CALL graft.system.vacuum(table => 'db.docs', grace_seconds => 0)
  *   CALL graft.system.compact_small(table => 'db.docs')
  *   CALL graft.system.purge_deletes(table => 'db.docs')
  *   CALL graft.system.expire_log(table => 'db.docs', retain_versions => 50)
  *   CALL graft.system.checkpoint(table => 'db.docs')
  *   CALL graft.system.restore(table => 'db.docs', version => 3)
  *   CALL graft.system.compact(table => 'db.docs', cluster_by => 'doc_id')
  * }}}
  *
  * Every procedure is a thin SQL veneer over the corresponding
  * maintenance method — same pruning, same atomic-swap commit, same
  * conflict contract — and RETURNS the method's observable result as a
  * one-row relation (files rewritten, versions expired, ...), so an
  * operator script can assert on what the pass actually did. The
  * `table` argument names a table of the ENCLOSING catalog
  * (`ns.table`, resolved against the same warehouse the DDL face
  * uses); procedures live in the reserved `system` namespace.
  *
  * Scale note: these are the O(change)/O(small-bytes) passes — CALLing
  * them on a 100 TB table does what the Scala caller gets, never a
  * table rewrite (that is `compact`, deliberately also exposed, loudly
  * documented as the full rewrite).
  */
object GraftProcedures {

  private def spark: SparkSession = SparkSession.active

  val names: Seq[String] = Seq("vacuum", "checkpoint", "expire_log",
    "compact_small", "purge_deletes", "restore", "compact",
    "create_tag", "drop_tag", "add_constraint", "drop_constraint",
    "clone")

  def identifiers: Array[Identifier] =
    names.map(n => Identifier.of(Array("system"), n)).toArray

  def load(catalogName: String, dirOf: Seq[String] => String,
           ident: Identifier): UnboundProcedure = {
    require(ident.namespace().toSeq == Seq("system"),
      s"catalog $catalogName procedures live in the system namespace " +
        s"(got ${ident.namespace().mkString(".")}.${ident.name()})")
    val dirFor: String => String = table => {
      val dir = dirOf(table.split('.').toSeq)
      require(ManifestTable.exists(spark, dir),
        s"table $table does not exist in catalog $catalogName")
      dir
    }
    ident.name() match {
      case "vacuum" => proc("vacuum",
        "delete unreferenced data files older than the grace window",
        Seq(p("table", StringType),
          p("grace_seconds", LongType, Some("86400"))),
        StructType(Seq(StructField("deleted_files", IntegerType, false))),
        in => Seq(ManifestTable.vacuum(spark, dirFor(str(in, 0)),
          graceMs = in.getLong(1) * 1000L)))
      case "checkpoint" => proc("checkpoint",
        "publish a full checkpoint at the current version",
        Seq(p("table", StringType)),
        StructType(Seq(StructField("version", LongType, false))),
        in => Seq(ManifestTable.checkpoint(spark, dirFor(str(in, 0)))))
      case "expire_log" => proc("expire_log",
        "drop manifest log entries beyond the retention window",
        Seq(p("table", StringType),
          p("retain_versions", LongType, Some("1000"))),
        StructType(Seq(StructField("expired_entries", IntegerType, false))),
        in => Seq(ManifestTable.expireLog(spark, dirFor(str(in, 0)),
          retainVersions = in.getLong(1))))
      case "compact_small" => proc("compact_small",
        "bin-pack under-sized files — O(small bytes), never O(table)",
        Seq(p("table", StringType),
          p("target_file_bytes", LongType, Some((128L * 1024 * 1024).toString)),
          p("min_file_bytes", LongType, Some((64L * 1024 * 1024).toString))),
        rewriteSchema,
        in => { val (a, b) = ManifestTable.compactSmall(spark,
          dirFor(str(in, 0)), targetFileBytes = in.getLong(1),
          minFileBytes = in.getLong(2)); Seq(a, b) })
      case "purge_deletes" => proc("purge_deletes",
        "rewrite files whose deletion-vector fraction crossed the threshold",
        Seq(p("table", StringType),
          p("max_deleted_fraction", DoubleType, Some("0.3"))),
        rewriteSchema,
        in => { val (a, b) = ManifestTable.purgeDeletes(spark,
          dirFor(str(in, 0)), maxDeletedFraction = in.getDouble(1))
          Seq(a, b) })
      case "restore" => proc("restore",
        "rewind the table to a retained version in one metadata commit",
        Seq(p("table", StringType), p("version", LongType)),
        StructType(Seq(StructField("restored", BooleanType, false),
          StructField("head_version", LongType, false))),
        in => { val dir = dirFor(str(in, 0))
          val done = ManifestTable.restore(spark, dir, in.getLong(1),
            s"sql-restore-${java.util.UUID.randomUUID()}")
          Seq(done, ManifestTable.snapshot(spark, dir).version) })
      case "compact" => proc("compact",
        "FULL table rewrite to target-sized files, optionally clustered " +
          "(comma-separated cluster_by; zorder => true for z-ordering)",
        Seq(p("table", StringType),
          p("target_file_bytes", LongType, Some((128L * 1024 * 1024).toString)),
          p("cluster_by", StringType, Some("''")),
          p("zorder", BooleanType, Some("false"))),
        rewriteSchema,
        in => { val cluster = str(in, 2).split(',').map(_.trim)
            .filter(_.nonEmpty).toSeq
          val (a, b) = ManifestTable.compact(spark, dirFor(str(in, 0)),
            targetFileBytes = in.getLong(1), clusterBy = cluster,
            zorder = in.getBoolean(3))
          Seq(a, b) })
      case "create_tag" => proc("create_tag",
        "name a version (default: head) — VERSION AS OF '<tag>' " +
          "resolves to it, and expiry/vacuum keep it live",
        Seq(p("table", StringType), p("tag", StringType),
          p("version", LongType, Some("-1"))),
        StructType(Seq(StructField("tag", StringType, false),
          StructField("version", LongType, false))),
        in => { val dir = dirFor(str(in, 0)); val tag = str(in, 1)
          val v = ManifestTable.createTag(spark, dir, tag,
            Some(in.getLong(2)).filter(_ >= 0L))
          Seq(UTF8String.fromString(tag), v) })
      case "drop_tag" => proc("drop_tag",
        "drop a tag — its snapshot re-enters normal retention",
        Seq(p("table", StringType), p("tag", StringType)),
        StructType(Seq(StructField("dropped", BooleanType, false))),
        in => Seq(ManifestTable.dropTag(spark, dirFor(str(in, 0)),
          str(in, 1))))
      case "clone" => proc("clone",
        "SHALLOW CLONE: one metadata commit referencing the source " +
          "table's live files by absolute path — zero data-file copies; " +
          "divergent writes stay isolated on either side",
        Seq(p("source", StringType), p("target", StringType)),
        StructType(Seq(StructField("version", LongType, false))),
        in => {
          val dst = dirOf(str(in, 1).split('.').toSeq)
          Seq(ManifestTable.shallowClone(spark, dirFor(str(in, 0)), dst))
        })
      case "add_constraint" => proc("add_constraint",
        "add a named CHECK constraint (validates existing rows first)",
        Seq(p("table", StringType), p("name", StringType),
          p("expr", StringType)),
        StructType(Seq(StructField("added", BooleanType, false))),
        in => Seq(ManifestTable.addConstraint(spark, dirFor(str(in, 0)),
          str(in, 1), str(in, 2))))
      case "drop_constraint" => proc("drop_constraint",
        "drop a named CHECK constraint",
        Seq(p("table", StringType), p("name", StringType)),
        StructType(Seq(StructField("dropped", BooleanType, false))),
        in => Seq(ManifestTable.dropConstraint(spark, dirFor(str(in, 0)),
          str(in, 1))))
      case other => throw new IllegalArgumentException(
        s"catalog $catalogName has no procedure system.$other " +
          s"(available: ${names.mkString(", ")})")
    }
  }

  private val rewriteSchema = StructType(Seq(
    StructField("rewritten_files", IntegerType, false),
    StructField("written_files", IntegerType, false)))

  private def str(in: InternalRow, i: Int): String = {
    require(!in.isNullAt(i), s"procedure argument $i must not be null")
    in.getUTF8String(i).toString
  }

  private def p(name: String, dt: DataType,
                default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  /** One procedure: bind is shape-only (Spark aligns + coerces against
    * `parameters`), call maps the argument row through `body` to ONE
    * result row, surfaced as a LocalScan relation.
    */
  private def proc(pname: String, desc: String,
                   params: Seq[ProcedureParameter], outSchema: StructType,
                   body: InternalRow => Seq[Any]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = pname
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = pname
          override def description(): String = desc
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
          : java.util.Iterator[Scan] = {
            val out = body(input).map {
              case s: String => UTF8String.fromString(s)
              case other => other
            }
            val row = InternalRow.fromSeq(out)
            Collections.singletonList[Scan](new LocalScan {
              override def readSchema(): StructType = outSchema
              override def rows(): Array[InternalRow] = Array(row)
            }).iterator()
          }
        }
    }
}
