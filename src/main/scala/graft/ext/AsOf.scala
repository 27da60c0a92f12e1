package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join — for every left row, the single right row
  * with the same key and the greatest right timestamp ≤ the left
  * timestamp (the point-in-time lookup behind feature stores, slowly
  * changing dimensions, and market-data enrichment). Spark has no native
  * asof operator; the naive encodings are a range join (quadratic pair
  * explosion before the per-row top-1 cut) or a per-left-row subquery.
  *
  * Spark-first shape instead: TAG both sides, UNION them, and run ONE
  * `last(_r, ignoreNulls).over(key window ordered by (ts, side))` — the
  * right payload "carries forward" onto every later left row, ties at
  * equal ts resolving right-before-left so an exactly-simultaneous
  * observation is visible (DuckDB ASOF's `>=` semantics, which the
  * oracle uses verbatim). One shuffle on the key, per-key linear work,
  * no pair explosion; a skewed key costs its own partition only, same
  * as any keyed window.
  *
  * Null semantics match a LEFT equi-join: a null join key never
  * matches — right rows with a null key are discarded, left rows with a
  * null key are kept with a null payload (they share a window partition,
  * but it contains no right rows). Null TIMESTAMPS never match either:
  * null-ts rows are excluded on both sides. Right rows must be unique
  * per (key, rightTs) — pre-aggregate the right side otherwise (the
  * `asof_join` query does). Right payload columns whose names collide
  * with left columns are auto-renamed with an `_right` suffix (repeated
  * until free), the same convention as pandas' merge suffixes.
  */
object AsOf {

  /** Left as-of-join right. Output: every left row (null-ts rows
    * excluded) plus the right side's non-key payload columns, null where
    * no right row is at or before the left timestamp.
    *
    * @param keys    equi-join key columns (present on both sides)
    * @param leftTs  left event-time column name
    * @param rightTs right event-time column name
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String): DataFrame = {
    val payloadCols =
      right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    require(payloadCols.nonEmpty, "right side has no payload columns")
    val leftCols = left.columns.toSeq
    // Colliding payload names pick up _right suffixes; internal temp
    // names are prefixed with underscores until they collide with
    // nothing on either side (ADVICE r8: fixed _ts/_l/_r names could
    // shadow user columns).
    val outName: Map[String, String] = {
      val taken = scala.collection.mutable.Set(leftCols: _*)
      payloadCols.map { c =>
        var n = c
        while (taken.contains(n)) n = n + "_right"
        taken += n
        c -> n
      }.toMap
    }
    val allNames = (leftCols ++ right.columns).toSet
    def fresh(base: String): String = {
      var n = base
      while (allNames.contains(n)) n = "_" + n
      n
    }
    val (tsC, sideC, lC, rC, carC) =
      (fresh("_ts"), fresh("_side"), fresh("_l"), fresh("_r"), fresh("_carried"))
    val k = keys.map(col)
    val keysNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val lType = org.apache.spark.sql.types.StructType(
      leftCols.map(c => left.schema(c)))
    val rType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))
    val l = left.filter(col(leftTs).isNotNull)
      .select(k ++ Seq(col(leftTs).as(tsC), lit(1).as(sideC),
        struct(leftCols.map(col): _*).as(lC),
        lit(null).cast(rType).as(rC)): _*)
    val r = right.filter(col(rightTs).isNotNull && keysNotNull)
      .select(k ++ Seq(col(rightTs).as(tsC), lit(0).as(sideC),
        lit(null).cast(lType).as(lC),
        struct(payloadCols.map(col): _*).as(rC)): _*)
    val w = Window.partitionBy(k: _*).orderBy(col(tsC), col(sideC))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(carC, last(col(rC), ignoreNulls = true).over(w))
      .filter(col(sideC) === 1)
      .select(leftCols.map(c => col(lC).getField(c).as(c)) ++
        payloadCols.map(c => col(carC).getField(c).as(outName(c))): _*)
  }
}
