package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (builder brief: "salting for skew, AQE for
  * runtime re-plan"). AQE's skew-join handling covers sort-merge joins
  * automatically; these helpers cover the two places AQE doesn't: a
  * single hot GROUP BY key, and a broadcast-unfriendly join against a
  * skewed key column.
  */
object Skew {

  /** Two-stage salted aggregation: rows first aggregate on (key, salt) —
    * spreading a hot key over `buckets` reducers — then the per-salt
    * partials combine on the key alone. For algebraic aggregates
    * (count/sum/min/max) the result is identical to the direct groupBy;
    * the second shuffle moves only `buckets` rows per key.
    *
    * The salt is `monotonically_increasing_id`-based, which is
    * retry-UNSTABLE: a recomputed partition can deal the same row to a
    * different salt bucket. That is deliberate — the salt must vary
    * WITHIN a key (a hash of the key columns is constant per key and
    * spreads nothing, and fully identical hot rows would collapse a
    * whole-row hash too), and for the algebraic aggregates this helper
    * targets the regrouped result is identical whichever bucket a row
    * lands in. Do not reuse this salt for non-algebraic aggregates
    * (collect_list, first) where per-bucket composition shows through.
    */
  def saltedCount(df: DataFrame, keyCols: Seq[String],
                  buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("_partial").as("n"))
  }

  /** Skewed equi-join: the big (skewed) side gets a random-ish salt in
    * [0, buckets); the small side is replicated `buckets` times, once per
    * salt value, so each hot-key task handles 1/buckets of the hot rows.
    * Semantics match `big.join(small, keys)` exactly; cost is
    * `buckets × |small|` replication, the classic salting trade.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 buckets: Int = 16): DataFrame = {
    val bigSalted = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val smallReplicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    bigSalted.join(smallReplicated, keys :+ "_salt").drop("_salt")
  }
}
