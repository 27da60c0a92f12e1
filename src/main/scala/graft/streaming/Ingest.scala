package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{QualityFilter, TextAnalysis}

/** The training-data ingest path composed end-to-end: corpus dedup →
  * quality filter → PII scrub — the order a real pipeline wants
  * (cheapest rejection first: an md5 anti-join kills exact repeats
  * before any text statistics run, and only documents that survive
  * filtering pay for scrubbing).
  *
  * Every stage is STATELESS — the anti-join probes a static corpus
  * index, the audit and the scrub are projections — so one function
  * serves three deployments identically: a Structured Streaming ingest
  * (Append mode, nothing grows with stream length), a batch backfill,
  * and the DuckDB replay oracle (`ingest_pipeline`). For stream-vs-ITSELF
  * dedup inside a watermark horizon, put
  * [[StreamDedup.dedupExactStream]] in front; it composes at the same
  * seam.
  */
object Ingest {

  /** Survivors of dedup + quality filtering, with PII scrubbed from the
    * text column. `corpusIndex` is a [[StreamDedup.fingerprintIndex]]
    * over the already-ingested corpus (persist it; broadcast if small).
    */
  def pipeline(docs: DataFrame, corpusIndex: DataFrame,
               textCol: String = "text"): DataFrame =
    QualityFilter.withQualityAudit(
        StreamDedup.dedupAgainstIndex(docs, corpusIndex, textCol), textCol)
      .filter(col("keep"))
      .drop("drop_reasons", "keep")
      .withColumn(textCol, TextAnalysis.scrubPii(col(textCol)))
}
