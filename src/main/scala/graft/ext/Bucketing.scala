package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) joins — the storage-layout half of the 100 TB
  * join story (SURVEY.md §4 "Partitioning & shuffle"). Writing both fact
  * tables bucketed AND sorted by the join key means every future
  * equi-join on that key reads co-located buckets: the sort-merge join's
  * distribution requirement is satisfied by the LAYOUT, so the plan has
  * NO Exchange on either side — at 100 TB that removes the single
  * largest cost of a repeated big-big join (re-shuffling both inputs on
  * every query).
  *
  * Spark-first: `bucketBy(n, key).sortBy(key)` on the writer + the
  * catalog; nothing custom. BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Persist `df` as an external bucketed table (bucket AND sort by
    * `key`): `buckets` files per partition, each holding one hash bucket
    * of the key space, pre-sorted so sort-merge joins skip their sort.
    */
  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
                    buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket key. With equal
    * bucket counts on both sides the join requires no exchange and no
    * sort — scan, zip buckets, merge.
    */
  def bucketedEquiJoin(spark: SparkSession, leftTable: String,
                       rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
