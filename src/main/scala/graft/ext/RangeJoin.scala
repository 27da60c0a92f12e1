package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed RANGE JOIN — match point events to the intervals that
  * contain them (`start <= ts AND ts <= end`, plus optional equi-keys) —
  * an operator Spark has no native physical strategy for: the built-in
  * planner turns a range predicate join into a broadcast nested loop (or
  * a cartesian product), which is events × intervals work and dies at
  * scale.
  *
  * Design (the standard bucketization reduction, stateless and
  * shuffle-bounded): pick a granularity `g`; each interval EXPLODES to
  * one row per g-bucket it covers; each event maps to its single bucket
  * floor(ts/g); the join is then an ordinary shuffled EQUI-join on
  * (keys, bucket) refined by the exact containment filter. Since an
  * event lives in exactly one bucket and an interval covers that bucket
  * iff it can contain the event, every qualifying (event, interval)
  * pair meets EXACTLY once — no post-join distinct, nothing stateful.
  *
  * Cost model: shuffle is O(events + intervals · avgSpan/g); candidate
  * pairs are events × intervals co-bucketed per key. Pick `g` near the
  * typical interval length — too small explodes the interval side, too
  * large degrades toward per-key all-pairs filtered late. Both ends are
  * INCLUSIVE ([start, end] — `BETWEEN` semantics, the oracle's contract).
  * Null timestamps/bounds never match (SQL comparison semantics); rows
  * with null keys never match (equi-join null semantics), matching the
  * engines' own range joins.
  *
  * The same reduction serves time-interval enrichment (sessions,
  * validity windows, slowly-changing dims) and any 1-D numeric
  * containment; for the "most recent at or before" shape use
  * [[AsOf.join]] instead — as-of is a carry-forward window, not a
  * containment join.
  */
object RangeJoin {

  /** Inner-join `events` to the `intervals` rows containing them.
    *
    * @param events     point side; `eventTs` is a numeric column
    * @param intervals  interval side; `startCol`/`endCol` numeric, both
    *                   inclusive; start > end rows match nothing
    * @param keys       equi-key columns present on BOTH sides (may be
    *                   empty: pure containment join)
    * @param granularity bucket width in `eventTs` units (> 0)
    * @param maxSpanBuckets guard against a degenerate interval exploding
    *                   the bucket side (a year-long interval at 1-second
    *                   granularity is 31M rows from ONE input row);
    *                   intervals wider than this many buckets throw —
    *                   re-run with a coarser `granularity`
    */
  def join(events: DataFrame, intervals: DataFrame, eventTs: String,
           startCol: String, endCol: String, keys: Seq[String] = Seq.empty,
           granularity: Long = 3600L, maxSpanBuckets: Int = 4096): DataFrame = {
    require(granularity > 0, "granularity must be > 0")
    def bucket(c: Column): Column = floor(c / lit(granularity)).cast("long")
    val spanOk = bucket(col(endCol)) - bucket(col(startCol)) < lit(maxSpanBuckets.toLong)
    // the guard lives INSIDE the exploded expression (a dropped helper
    // column would be pruned away and never evaluate); raise_error's
    // NullType coerces to the array branch under CASE WHEN
    val buckets = when(spanOk, sequence(bucket(col(startCol)), bucket(col(endCol))))
      .otherwise(raise_error(
        lit(s"RangeJoin: an interval spans >= $maxSpanBuckets buckets at " +
          s"granularity $granularity — widen granularity or raise maxSpanBuckets")))
    val exploded = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("_rj_bucket", explode(buckets))
    val pointed = events
      .filter(col(eventTs).isNotNull)
      .withColumn("_rj_bucket", bucket(col(eventTs)))
    pointed
      .join(exploded, keys :+ "_rj_bucket")
      .filter(col(startCol) <= col(eventTs) && col(eventTs) <= col(endCol))
      .drop("_rj_bucket")
  }

  /** Interval-OVERLAP join — pairs from two interval sets that intersect
    * (`aStart <= bEnd AND bStart <= aEnd`, both ends inclusive, plus
    * optional equi-keys). Same bucketization as [[join]], with the
    * exactly-once condition one step subtler: two overlapping intervals
    * co-occupy EVERY bucket of their intersection, so emitting on the
    * raw bucket join would duplicate pairs. Each pair is kept only in
    * the FIRST bucket of the intersection — max(bucket(aStart),
    * bucket(bStart)), a per-row filter on the joined row — so the dedup
    * is stateless and no distinct() materializes the pair set.
    *
    * The left side's column names must not collide with the right's
    * (rename upstream, the usual Spark self-join contract); `left` and
    * `right` may be the same logical table for a self-overlap join.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lStart: String, lEnd: String, rStart: String, rEnd: String,
                  keys: Seq[(String, String)] = Seq.empty,
                  granularity: Long = 3600L,
                  maxSpanBuckets: Int = 4096): DataFrame = {
    require(granularity > 0, "granularity must be > 0")
    def bucket(c: Column): Column = floor(c / lit(granularity)).cast("long")
    def exploded(df: DataFrame, s: String, e: String): DataFrame = {
      val spanOk = bucket(col(e)) - bucket(col(s)) < lit(maxSpanBuckets.toLong)
      df.filter(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
        .withColumn("_rj_bucket", explode(
          when(spanOk, sequence(bucket(col(s)), bucket(col(e))))
            .otherwise(raise_error(
              lit(s"RangeJoin: an interval spans >= $maxSpanBuckets buckets " +
                s"at granularity $granularity — widen granularity or raise " +
                "maxSpanBuckets")))))
    }
    val keyCond = keys.map { case (l, r) => col(l) === col(r) }
      .foldLeft(lit(true))(_ && _)
    exploded(left, lStart, lEnd).as("_rj_l")
      .join(exploded(right, rStart, rEnd).as("_rj_r"),
        col("_rj_l._rj_bucket") === col("_rj_r._rj_bucket") && keyCond)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // exactly-once: keep the pair only in the intersection's first bucket
      .filter(col("_rj_l._rj_bucket") ===
        greatest(bucket(col(lStart)), bucket(col(rStart))))
      .drop("_rj_bucket")
  }
}
