package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** Streaming NEAR-duplicate probe — the approximate sibling of
  * [[StreamDedup]] (which is exact-only) and the last member of the dedup
  * family: flag documents arriving on a stream that are near-duplicates
  * of an already-indexed batch corpus.
  *
  * Design (Spark-first): the corpus is distilled ONCE into a static
  * SimHash band index ([[buildIndex]]); the stream side is pure stateless
  * column work — simhash each arriving document, explode its `bands` bit
  * slices, stream-static equi-join on (band, bval), verify candidates
  * with the exact [[TextAnalysis.hammingDist32]], and dedup multi-band
  * agreements with the same first-agreeing-band filter as the batch
  * `simhashNearDup` (both signatures ride on the joined row, so the
  * filter is per-row — no distinct(), no state store). Because no
  * operator holds state, any output mode works and nothing grows with
  * stream length; the same `probe` function applied to a batch frame is
  * the replay oracle (`stream_near_dup_replay`).
  *
  * Scale notes: the index holds one row per (distinct signature, band) —
  * 4 rows of ~30 bytes per distinct signature at the default — so a
  * billion-distinct-signature corpus indexes at ~120 GB spread across
  * executors, joined by Spark as an ordinary shuffled equi-join; persist
  * it (`index.persist()`) so the per-microbatch join does not rescan the
  * corpus parquet, and for small corpora mark it `broadcast(...)` to make
  * each microbatch join map-side. By pigeonhole, candidate generation is
  * EXACT for hamming <= bands-1 (default 4 bands / maxHamming 3): a
  * probe within the threshold of an indexed doc shares at least one
  * 8-bit slice and cannot be missed.
  */
object StreamNearDup {

  private def bitSlice(sh: Column, b: Int, width: Int): Column =
    shiftright(sh, b * width).bitwiseAND((1L << width) - 1)

  private def bandStructs(sh: Column, bands: Int, width: Int): Column =
    array((0 until bands).map(b => struct(
      lit(b).as("band"), bitSlice(sh, b, width).as("bval"))): _*)

  /** Build the static band index over a batch corpus: the corpus
    * collapses to its DISTINCT signatures (ids ride along as a sorted
    * list, so identical-signature clusters cost one row), each exploded
    * into its `bands` (band, bval) slices. Columns:
    * (band, bval, sh_idx, ids).
    */
  def buildIndex(corpus: DataFrame, idCol: String, textCol: String,
                 bands: Int = 4): DataFrame = {
    require(32 % bands == 0, s"bands must divide 32, got $bands")
    val width = 32 / bands
    // Null text never pairs: filter the CHEAP column (pushes into the
    // parquet scan), not the computed signature — any isnotnull(sh)
    // filter, explicit or constraint-inferred, gets substituted through
    // the projection and re-evaluates simhash on every row in a second
    // stage. simhash is null only for null text, so post-filter the
    // coalesce sentinel can never fire; its job is to make the column
    // NON-NULLABLE so InferFiltersFromConstraints has nothing to infer
    // from the join/group keys (observed in PLANS.md before this fix).
    corpus
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        coalesce(TextAnalysis.simhash32(col(textCol)), lit(0L)).as("sh_idx"))
      .groupBy("sh_idx").agg(sort_array(collect_list(col("id"))).as("ids"))
      .select(col("sh_idx"), col("ids"),
        explode(bandStructs(col("sh_idx"), bands, width)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bval").as("bval"),
        col("sh_idx"), col("ids"))
  }

  /** Probe `docs` — a STREAMING frame (stream-static join) or a batch
    * frame (oracle replay; identical plan shape) — against an index from
    * [[buildIndex]] built with the same `bands`. Emits one row per
    * (probe document, indexed near-duplicate):
    * (probe_id, corpus_id, hamming).
    */
  def probe(docs: DataFrame, index: DataFrame, idCol: String,
            textCol: String, bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(32 % bands == 0, s"bands must divide 32, got $bands")
    require(maxHamming <= bands - 1,
      s"banding is only exact for maxHamming <= bands-1 (got $maxHamming/$bands)")
    val width = 32 / bands
    // Cheap-column null filter + non-nullable signature, same rationale
    // as buildIndex: keep constraint inference from rebuilding an
    // expensive isnotnull(simhash(text)) filter stage.
    val probes = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("probe_id"),
        coalesce(TextAnalysis.simhash32(col(textCol)), lit(0L)).as("sh_p"))
      .select(col("probe_id"), col("sh_p"),
        explode(bandStructs(col("sh_p"), bands, width)).as("bb"))
      .select(col("probe_id"), col("sh_p"),
        col("bb.band").as("band"), col("bb.bval").as("bval"))
    // A probe agreeing with an indexed signature in several bands joins
    // once per agreeing band; keeping only the FIRST agreeing band dedups
    // exactly-once statelessly (cf. TextAnalysis.simhashNearDup).
    val firstAgreeingBand = (0 until bands).foldRight(lit(bands)) { (b, rest) =>
      when(bitSlice(col("sh_p"), b, width) === bitSlice(col("sh_idx"), b, width),
        lit(b)).otherwise(rest)
    }
    probes
      .join(index, Seq("band", "bval"))
      .filter(col("band") === firstAgreeingBand)
      .withColumn("hamming",
        TextAnalysis.hammingDist32(col("sh_p"), col("sh_idx")))
      .filter(col("hamming") <= maxHamming)
      .select(col("probe_id"), explode(col("ids")).as("corpus_id"),
        col("hamming").cast("long").as("hamming"))
  }
}
