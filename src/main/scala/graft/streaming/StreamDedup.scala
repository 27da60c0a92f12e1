package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the continuous-ingest variant of the
  * batch `dedup_exact` operator (north-star dedup family): drop any
  * document whose content fingerprint was already seen within the
  * watermark horizon.
  *
  * Scale notes: state is one compact row per DISTINCT fingerprint inside
  * the horizon (the md5 key, not the text), partitioned by the
  * fingerprint across executors like any keyed state; the watermark
  * evicts fingerprints older than `lateness`, so state is bounded by the
  * distinct-rate × horizon, not by stream length. The same md5 key as
  * the batch path means a batch backfill and the streaming ingest
  * dedup identically.
  */
object StreamDedup {

  /** Keep the first arrival of each fingerprint; drop repeats arriving
    * within `lateness` of the watermark. `docs` must be a streaming frame
    * with an event-time column `tsCol`.
    */
  def dedupExactStream(docs: DataFrame, tsCol: String = "ts",
                       textCol: String = "text",
                       lateness: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fp")
}
