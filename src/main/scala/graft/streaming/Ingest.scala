package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
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

  // ------------------------------------------- self-maintaining corpus

  /** The persisted fingerprint index at `indexDir/current` (one `fp`
    * column), or an empty frame before the first batch.
    */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexDir), spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/current")))
      spark.read.parquet(s"$indexDir/current")
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("fp",
          org.apache.spark.sql.types.StringType))))
  }

  private def writeIndex(spark: SparkSession, indexDir: String,
                         index: DataFrame): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexDir), spark.sparkContext.hadoopConfiguration)
    val cur = new org.apache.hadoop.fs.Path(s"$indexDir/current")
    val stage = new org.apache.hadoop.fs.Path(s"$indexDir/_stage")
    val old = new org.apache.hadoop.fs.Path(s"$indexDir/_old")
    fs.delete(stage, true)
    index.write.parquet(stage.toString)
    fs.delete(old, true)
    if (fs.exists(cur)) fs.rename(cur, old)
    fs.rename(stage, cur)
    fs.delete(old, true)
  }

  /** Fold ONE batch of arriving documents into a self-maintaining
    * corpus: batch-local exact dedup, [[pipeline]] against the persisted
    * fingerprint index, survivors appended to `corpusDir`, their
    * fingerprints merged into the index (stage + rename swap).
    *
    * The index update is what makes a REPLAYED batch self-deduplicating:
    * once a batch's fingerprints are merged, re-applying the same batch
    * anti-joins everything away and appends nothing. Append-then-index
    * ordering means a crash BETWEEN the two can duplicate that one
    * batch's survivors in the corpus (at-least-once; [[ext.Compact]] or
    * dedup-on-read cleans up) — the index-first ordering would silently
    * LOSE the batch instead, which is the wrong failure mode for
    * training data.
    */
  def ingestBatch(batch: DataFrame, corpusDir: String, indexDir: String,
                  textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    val idx = readIndex(spark, indexDir)
    // The index keys ARRIVAL content, so fingerprints are taken BEFORE
    // the scrub: the corpus stores scrubbed text, and md5(scrubbed)
    // would never match a re-arriving raw document — a repeat of any
    // PII-bearing document would re-ingest forever. (This is also why
    // ingestBatch decomposes pipeline() rather than calling it: the
    // pre-scrub survivors must be observable.) Batch-local exact dedup
    // first; which surviving row carries a duplicated text is
    // arbitrary, as with any content-keyed dedup.
    val kept = graft.core.Caches.track(
      QualityFilter.withQualityAudit(
          StreamDedup.dedupAgainstIndex(
            batch.dropDuplicates(Seq(textCol)), idx, textCol), textCol)
        .filter(col("keep"))
        .drop("drop_reasons", "keep")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    kept.withColumn(textCol, TextAnalysis.scrubPii(col(textCol)))
      .write.mode("append").parquet(corpusDir)
    writeIndex(spark, indexDir,
      idx.unionByName(kept.select(md5(col(textCol)).as("fp"))).distinct())
    kept.unpersist()
  }

  /** [[pipeline]] wired as a continuously-running sink: each micro-batch
    * runs [[ingestBatch]] — dedup vs the corpus so far (including
    * earlier micro-batches of this same stream), filter, scrub, append,
    * maintain the index.
    */
  def pipelineToCorpus(docs: DataFrame, corpusDir: String, indexDir: String,
                       textCol: String = "text",
                       trigger: Trigger = Trigger.ProcessingTime("0 seconds"),
                       checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, corpusDir, indexDir, textCol)
      }
    checkpointDir.fold(writer)(cp => writer.option("checkpointLocation", cp))
      .start()
  }
}
