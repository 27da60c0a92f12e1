package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global contiguous 0-based ordinal, ordered by a key — the scalable
  * replacement for `row_number().over(Window.orderBy(key))`, which moves
  * EVERY row into one partition (Spark itself warns "No Partition
  * Defined for Window operation") and caps the operator at one core and
  * one executor's memory no matter the cluster size.
  *
  * The reference enumerates file rows sequentially (enumerate() in
  * auto_translate.py) to mint positions; this reproduces those exact
  * values distributively in two passes, the same shape as a global sort:
  *
  *  1. `repartitionByRange(key)` + `sortWithinPartitions(key)` — the
  *     ordinary total-order exchange (range bounds come from sampling,
  *     but the RESULT order, and therefore every position, is
  *     bound-independent for a unique key);
  *  2. `zipWithIndex` — one tiny job collects per-partition COUNTS
  *     (numPartitions longs to the driver, not data), then each
  *     partition stamps offset + local index.
  *
  * The sorted frame is evaluated twice (count pass + stamp pass) — the
  * standard zipWithIndex cost, cheaper at any scale than single-
  * threading the corpus. This is one of the rare per-partition
  * imperative cases where dropping to the RDD API is the right tool; the
  * result comes straight back to a DataFrame with the ordinal appended.
  */
object Ordinal {

  /** PRECONDITION: `orderCol` must be UNIQUE. Positions are deterministic
    * only for a unique key — with duplicates, tie order after
    * `sortWithinPartitions` depends on shuffle arrival, so recomputation
    * after cache eviction can stamp DIFFERENT pos values on tied rows
    * across downstream actions. Callers with non-unique keys must add a
    * tie-breaking column to `orderCol`'s table first (e.g. a composite
    * key projected to one column), not rely on arrival order.
    */
  def withGlobalPos(df: DataFrame, orderCol: String,
                    posCol: String = "pos"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(col(orderCol))
      .sortWithinPartitions(orderCol)
    // Persist the sorted RDD so the range shuffle + reduce-side sort run
    // ONCE: zipWithIndex's eager count pass materializes it, the stamp
    // pass (and every downstream action) reads the cached blocks — the
    // same two-pass persist rule Batching.assignBatches earned in r1.
    // Cleanup defers to ContextCleaner / Caches.release().
    val rdd = graft.core.Caches.track(
      sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    val indexed = rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed,
      sorted.schema.add(posCol, LongType, nullable = false))
  }
}
