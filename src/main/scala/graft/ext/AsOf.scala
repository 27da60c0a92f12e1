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
  * Preconditions: right rows must be unique per (key, rightTs) —
  * pre-aggregate the right side otherwise (the `asof_join` query does);
  * null timestamps never match (filtered on both sides); and right
  * payload column names must not collide with left column names (the
  * output carries both verbatim, the usual equi-join caveat).
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
    val k = keys.map(col)
    val lType = org.apache.spark.sql.types.StructType(
      leftCols.map(c => left.schema(c)))
    val rType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))
    val l = left.filter(col(leftTs).isNotNull)
      .select(k ++ Seq(col(leftTs).as("_ts"), lit(1).as("_side"),
        struct(leftCols.map(col): _*).as("_l"),
        lit(null).cast(rType).as("_r")): _*)
    val r = right.filter(col(rightTs).isNotNull)
      .select(k ++ Seq(col(rightTs).as("_ts"), lit(0).as("_side"),
        lit(null).cast(lType).as("_l"),
        struct(payloadCols.map(col): _*).as("_r")): _*)
    val w = Window.partitionBy(k: _*).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_carried", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col("_l").getField(c).as(c)) ++
        payloadCols.map(c => col("_carried").getField(c).as(c)): _*)
  }
}
