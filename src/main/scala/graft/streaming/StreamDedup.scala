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

  /** Distinct content fingerprints of an already-ingested batch corpus —
    * the static index for [[dedupAgainstIndex]]. One 16-byte-hex row per
    * distinct document; persist it so per-microbatch joins don't rescan
    * the corpus.
    */
  def fingerprintIndex(corpus: DataFrame, textCol: String = "text"): DataFrame =
    corpus.select(md5(col(textCol)).as("fp")).distinct()

  /** Drop documents (streaming OR batch) whose content fingerprint
    * already exists in a batch corpus — backfill-aware ingest dedup, the
    * stream-vs-CORPUS complement of [[dedupExactStream]]'s
    * stream-vs-itself horizon. A stateless stream-static left-anti join
    * on the same md5 key as batch `dedup_exact`, so corpus backfill,
    * in-stream dedup, and corpus-probe dedup all agree on what counts as
    * a duplicate; nothing is held in the state store, so the stream side
    * never grows with corpus or stream size.
    */
  def dedupAgainstIndex(docs: DataFrame, index: DataFrame,
                        textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp", md5(col(textCol)))
      .join(index, Seq("fp"), "left_anti")
      .drop("fp")
}
