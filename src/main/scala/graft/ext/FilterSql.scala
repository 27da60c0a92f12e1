package graft.ext

import org.apache.spark.sql.sources._

/** V1 `sources.Filter` → predicate-SQL text, the bridge between Spark's
  * pushed-filter seams and [[ManifestTable]]'s string-predicate APIs
  * (`readWhere` / `deleteWhere` / `overwriteWhere` all parse a SQL
  * expression). Translation is TOTAL-OR-NOTHING per filter: a filter
  * with any untranslatable piece returns None, and the caller keeps it
  * un-pushed (scans re-apply residual filters above, deletes refuse) —
  * the same one-sided honesty as stats skipping, a dropped conjunct can
  * only widen a read, never narrow a delete.
  *
  * Values are rendered as SQL literals from their RUNTIME types (the
  * only information a `sources.Filter` carries): strings quote-escape,
  * date/timestamp render as typed literals, numerics and booleans pass
  * through. Column names re-quote with backticks per path segment, so
  * reserved words and dotted struct fields survive re-parsing.
  */
object FilterSql {

  private def colRef(attribute: String): String =
    attribute.split('.').map(seg => "`" + seg.replace("`", "``") + "`")
      .mkString(".")

  private def lit(v: Any): Option[String] = v match {
    case null => None // null literals only appear via IsNull/EqualNullSafe
    case s: String => Some("'" + s.replace("'", "''") + "'")
    case s: org.apache.spark.unsafe.types.UTF8String =>
      Some("'" + s.toString.replace("'", "''") + "'")
    case b: Boolean => Some(if (b) "true" else "false")
    case b: Byte => Some(s"${b}Y")
    case sh: Short => Some(s"${sh}S")
    case i: Int => Some(i.toString)
    case l: Long => Some(s"${l}L")
    case f: Float => Some(s"CAST('$f' AS FLOAT)")
    case d: Double => Some(s"CAST('$d' AS DOUBLE)")
    case d: java.math.BigDecimal => Some(d.toPlainString + "BD")
    case d: BigDecimal => Some(d.underlying.toPlainString + "BD")
    case d: java.sql.Date => Some(s"DATE'$d'")
    case d: java.time.LocalDate => Some(s"DATE'$d'")
    case t: java.sql.Timestamp =>
      // ISO-ish without zone: rendered in the session zone both ways
      Some(s"TIMESTAMP'${t.toString}'")
    case t: java.time.Instant => Some(s"TIMESTAMP'${t.toString}'")
    case _ => None
  }

  /** The filter as predicate SQL, or None when any piece cannot be
    * rendered exactly.
    */
  def toSql(f: Filter): Option[String] = f match {
    case EqualTo(a, v) => lit(v).map(l => s"(${colRef(a)} = $l)")
    case EqualNullSafe(a, null) => Some(s"(${colRef(a)} IS NULL)")
    case EqualNullSafe(a, v) => lit(v).map(l => s"(${colRef(a)} <=> $l)")
    case GreaterThan(a, v) => lit(v).map(l => s"(${colRef(a)} > $l)")
    case GreaterThanOrEqual(a, v) => lit(v).map(l => s"(${colRef(a)} >= $l)")
    case LessThan(a, v) => lit(v).map(l => s"(${colRef(a)} < $l)")
    case LessThanOrEqual(a, v) => lit(v).map(l => s"(${colRef(a)} <= $l)")
    case In(a, vs) =>
      if (vs.isEmpty) Some("false")
      else {
        val ls = vs.toSeq.map(lit)
        if (ls.exists(_.isEmpty)) None
        else Some(s"(${colRef(a)} IN (${ls.flatten.mkString(", ")}))")
      }
    case IsNull(a) => Some(s"(${colRef(a)} IS NULL)")
    case IsNotNull(a) => Some(s"(${colRef(a)} IS NOT NULL)")
    case And(l, r) =>
      for (ls <- toSql(l); rs <- toSql(r)) yield s"($ls AND $rs)"
    case Or(l, r) =>
      for (ls <- toSql(l); rs <- toSql(r)) yield s"($ls OR $rs)"
    case Not(c) => toSql(c).map(s => s"(NOT $s)")
    case StringStartsWith(a, v) =>
      Some(s"(${colRef(a)} LIKE ${likeLit(v, suffix = "%")})")
    case StringEndsWith(a, v) =>
      Some(s"(${colRef(a)} LIKE ${likeLit(v, prefix = "%")})")
    case StringContains(a, v) =>
      Some(s"(${colRef(a)} LIKE ${likeLit(v, prefix = "%", suffix = "%")})")
    case AlwaysTrue() => Some("true")
    case AlwaysFalse() => Some("false")
    case _ => None
  }

  // the VALUE part of a LIKE pattern must escape its metacharacters
  private def likeLit(v: String, prefix: String = "",
                      suffix: String = ""): String = {
    val escaped = v.replace("\\", "\\\\").replace("%", "\\%")
      .replace("_", "\\_").replace("'", "''")
    s"'$prefix$escaped$suffix'"
  }

  /** All-or-nothing conjunction: Some(SQL of `fs` ANDed) only when every
    * filter translates — what a DELETE needs (dropping a conjunct would
    * delete MORE rows than asked).
    */
  def conjunctionSql(fs: Seq[Filter]): Option[String] = {
    if (fs.isEmpty) return Some("true")
    val parts = fs.map(toSql)
    if (parts.exists(_.isEmpty)) None
    else Some(parts.flatten.mkString(" AND "))
  }
}
