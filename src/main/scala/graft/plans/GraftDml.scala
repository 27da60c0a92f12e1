package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, AttributeSet, EqualTo, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.ext.{GraftTableV2, ManifestTable}

/** SQL `UPDATE` and `MERGE INTO` for graft-manifest tables — the two DML
  * verbs the DSv2 seams don't carry (Spark routes them to
  * `SupportsRowLevelOperations`, a full V2 write stack). Instead of
  * duplicating the write path behind that interface, this resolution
  * rule converts the RESOLVED logical commands into the engine's own
  * row-level operations — the same file-pruned, constraint-checked,
  * CDC-classified copy-on-write commits every Scala caller gets:
  *
  *   - `UPDATE t SET c = expr, ... WHERE p`  →
  *     [[ManifestTable.updateWhere]] (stats+bloom candidate pruning; the
  *     SET expressions evaluate against the OLD row, standard SQL
  *     semantics, cast back to the column type);
  *   - `MERGE INTO t USING s ON t.k = s.k
  *        WHEN MATCHED THEN UPDATE SET *
  *        WHEN NOT MATCHED THEN INSERT *`   →
  *     [[ManifestTable.merge]] (source-key file pruning: an upsert
  *     batch touches O(matched files), never the table);
  *   - `MERGE INTO t USING s ON t.k = s.k
  *        WHEN MATCHED THEN DELETE`         →
  *     [[ManifestTable.deleteMatching]] (the CDC apply path's
  *     tombstone half — delete-by-source-keys, same pruning).
  *
  * The MERGE mapping accepts exactly the two shapes above — what the
  * engine's row ops implement (matched rows replaced by their source
  * row and absent rows inserted; or matched rows deleted). Conditional
  * actions, mixed UPDATE+DELETE clauses, partial-column updates and
  * `NOT MATCHED BY SOURCE` clauses are a
  * LOUD UnsupportedOperationException, never a silent approximation;
  * `WITH SCHEMA EVOLUTION` is rejected the same way (merge is not a
  * schema change — `ALTER TABLE ... ADD COLUMN` first).
  *
  * Expressions are re-printed as predicate SQL (qualifiers stripped so
  * they resolve against the table's own frame) because the manifest
  * row-level API is SQL-string-native — that is what its stats pruning
  * parses. Subqueries cannot survive that seam and are rejected.
  *
  * Injected as a RESOLUTION rule (same slot Delta intercepts MERGE at):
  * it fires the moment the command is fully resolved, before the
  * analyzer's row-level alignment machinery can object that the table
  * lacks `SupportsRowLevelOperations`.
  *
  * CDC: when the table property [[ManifestTable.ChangeFeedProperty]]
  * (`graft.enableChangeFeed = true`) is set, both verbs record their
  * CDC sidecars — so the change feed spans SQL mutations (Delta's
  * `enableChangeDataFeed` contract). Without it a later
  * `readChangeFeed` over the commit raises rather than drifting.
  */
class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u: UpdateTable if u.resolved =>
      graftTarget(u.table).map(convertUpdate(u, _)).getOrElse(u)
    case m: MergeIntoTable if m.resolved =>
      graftTarget(m.targetTable).map(convertMerge(m, _)).getOrElse(m)
    case other => other
  }

  /** The target, unwrapped to its catalog table — None for non-graft
    * targets (Spark's own machinery then reports its own unsupported).
    */
  private def graftTarget(plan: LogicalPlan): Option[GraftTableV2] =
    plan match {
      case SubqueryAlias(_, child) => graftTarget(child)
      case r: DataSourceV2Relation =>
        r.table match {
          case t: GraftTableV2 => Some(t)
          case _ => None
        }
      case _ => None
    }

  /** Resolved expression → predicate SQL the manifest API can re-parse
    * against the bare table frame: qualifiers dropped (the frame has
    * none), subqueries rejected (they cannot cross the string seam).
    */
  private def sqlOf(e: Expression): String = {
    if (e.exists(_.isInstanceOf[PlanExpression[_]]))
      throw new UnsupportedOperationException(
        "graft-manifest UPDATE/MERGE does not support subqueries in " +
          s"conditions or SET expressions (got: ${e.sql})")
    e.transformUp {
      case a: AttributeReference => a.withQualifier(Nil)
      // fold analyzer-inserted casts of literals (CAST(100 AS BIGINT))
      // back into typed literals — the stats pruner matches bare
      // literals, and an unfolded cast would silently cost the rewrite
      // its file pruning
      case f if f.foldable && !f.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.Literal] =>
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(f.eval(InternalRow.empty), f.dataType)
    }.sql
  }

  private def convertUpdate(u: UpdateTable,
                            table: GraftTableV2): LogicalPlan = {
    require(table.pinned.isEmpty,
      s"cannot UPDATE a time-travel pinned version of ${table.name()}")
    // identity assignments appear when the analyzer has pre-aligned the
    // command (one assignment per column); only real changes travel
    val sets = u.assignments.flatMap { a =>
      val col = a.key match {
        case attr: AttributeReference => attr.name
        case other => throw new UnsupportedOperationException(
          s"graft-manifest UPDATE sets top-level columns only (got " +
            s"${other.sql}; struct-field updates are not supported)")
      }
      if (a.value.semanticEquals(a.key)) None else Some(col -> sqlOf(a.value))
    }
    if (sets.isEmpty)
      throw new UnsupportedOperationException(
        "UPDATE with no effective SET assignment")
    val cond = u.condition.map(sqlOf).getOrElse("true")
    GraftUpdateCommand(table.dir, cond, sets.toMap)
  }

  private def convertMerge(m: MergeIntoTable,
                           table: GraftTableV2): LogicalPlan = {
    require(table.pinned.isEmpty,
      s"cannot MERGE into a time-travel pinned version of ${table.name()}")
    def unsupported(what: String): Nothing =
      throw new UnsupportedOperationException(
        s"graft-manifest MERGE supports exactly the upsert shape " +
          "(ON <conjunction of t.k = s.k>, WHEN MATCHED THEN UPDATE " +
          "SET *, WHEN NOT MATCHED THEN INSERT *); " + what)
    if (m.schemaEvolutionEnabled || m.withSchemaEvolution)
      unsupported("WITH SCHEMA EVOLUTION is not supported — MERGE is " +
        "not a schema change, ALTER TABLE ... ADD COLUMN first")
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported("NOT MATCHED BY SOURCE clauses are not supported")
    val targetOut = AttributeSet(m.targetTable.output)
    val sourceOut = AttributeSet(m.sourceTable.output)

    def sideName(e: Expression, side: AttributeSet): Option[String] =
      e match {
        case a: AttributeReference if side.contains(a) => Some(a.name)
        case Alias(a: AttributeReference, _) if side.contains(a) =>
          Some(a.name)
        case _ => None
      }

    val keyCols = splitConjunctivePredicates(m.mergeCondition).map {
      case EqualTo(l, r) =>
        (sideName(l, targetOut), sideName(r, sourceOut),
          sideName(r, targetOut), sideName(l, sourceOut)) match {
          case (Some(t), Some(s), _, _) if t.equalsIgnoreCase(s) => t
          case (_, _, Some(t), Some(s)) if t.equalsIgnoreCase(s) => t
          case _ => unsupported(
            s"ON conjunct is not a same-named target/source column " +
              s"equality: ${EqualTo(l, r).sql}")
        }
      case other =>
        unsupported(s"ON conjunct is not an equality: ${other.sql}")
    }

    // an action's assignments must map every target column from its
    // same-named source column — the full-row replace/insert the
    // engine's merge performs (key columns may ride on the ON equality)
    def requireStarShape(assignments: Seq[Assignment], verb: String,
                         keysImplicit: Boolean): Unit = {
      val assigned = assignments.map { a =>
        val col = a.key match {
          case attr: AttributeReference => attr.name
          case other => unsupported(
            s"$verb assigns a non-column target: ${other.sql}")
        }
        a.value match {
          case s: AttributeReference
              if sourceOut.contains(s) && s.name.equalsIgnoreCase(col) =>
          case other => unsupported(
            s"$verb sets $col from ${other.sql}, not from the " +
              s"same-named source column — partial or computed " +
              "assignments do not match the engine's full-row upsert")
        }
        col.toLowerCase
      }.toSet
      val missing = m.targetTable.output.map(_.name)
        .filterNot(n => assigned.contains(n.toLowerCase))
        .filterNot(n => keysImplicit &&
          keyCols.exists(_.equalsIgnoreCase(n)))
      if (missing.nonEmpty)
        unsupported(s"$verb leaves target columns unassigned: " +
          missing.mkString(", "))
    }

    // the DELETE shape: `WHEN MATCHED THEN DELETE` alone — the delete
    // half of a CDC apply, lowered to the engine's deleteMatching
    // (source-key-pruned tombstone application)
    (m.matchedActions, m.notMatchedActions) match {
      case (Seq(DeleteAction(None)), Seq()) =>
        return GraftMergeDeleteCommand(table.dir, m.sourceTable, keyCols)
      case _ => ()
    }

    m.matchedActions match {
      case Seq(UpdateAction(None, assignments, _)) =>
        requireStarShape(assignments, "WHEN MATCHED UPDATE",
          keysImplicit = true)
      case other => unsupported(
        s"matched actions must be exactly one unconditional UPDATE " +
          s"SET * or a sole unconditional DELETE (got " +
          s"${other.mkString("; ")})")
    }
    m.notMatchedActions match {
      case Seq(InsertAction(None, assignments)) =>
        requireStarShape(assignments, "WHEN NOT MATCHED INSERT",
          keysImplicit = false)
      case other => unsupported(
        s"not-matched actions must be exactly one unconditional " +
          s"INSERT * (got ${other.mkString("; ")})")
    }

    GraftMergeCommand(table.dir, m.sourceTable, keyCols)
  }
}

/** `UPDATE` lowered to [[ManifestTable.updateWhere]] — one atomic
  * copy-on-write commit over the stats-pruned candidate files.
  */
case class GraftUpdateCommand(dir: String, condSql: String,
                              set: Map[String, String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    ManifestTable.updateWhere(spark, dir, condSql, set,
      s"sql-update-${java.util.UUID.randomUUID()}",
      cdc = ManifestTable.changeFeedEnabled(
        ManifestTable.snapshot(spark, dir)))
    Seq.empty
  }
}

/** `MERGE INTO t USING s ON keys WHEN MATCHED THEN DELETE` lowered to
  * [[ManifestTable.deleteMatching]] — delete-by-source-keys, the CDC
  * apply path's tombstone half, rewriting only the source-key-pruned
  * candidate files.
  */
case class GraftMergeDeleteCommand(dir: String,
                                   @transient source: LogicalPlan,
                                   keyCols: Seq[String])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.graft.GraftSqlShims.ofRows(spark, source)
    ManifestTable.deleteMatching(src, dir, keyCols,
      s"sql-merge-delete-${java.util.UUID.randomUUID()}",
      cdc = ManifestTable.changeFeedEnabled(
        ManifestTable.snapshot(spark, dir)))
    Seq.empty
  }
}

/** `MERGE INTO` (upsert shape) lowered to [[ManifestTable.merge]] —
  * source-key pruning, one atomic commit. The source plan rides along
  * resolved and is executed as a normal DataFrame at run time (so a
  * graft-table source still reads through its pruned scan).
  */
case class GraftMergeCommand(dir: String,
                             @transient source: LogicalPlan,
                             keyCols: Seq[String])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.graft.GraftSqlShims.ofRows(spark, source)
    ManifestTable.merge(src, dir, keyCols,
      s"sql-merge-${java.util.UUID.randomUUID()}",
      cdc = ManifestTable.changeFeedEnabled(
        ManifestTable.snapshot(spark, dir)))
    Seq.empty
  }
}
