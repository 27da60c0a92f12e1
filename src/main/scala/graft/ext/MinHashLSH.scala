package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection for training-data
  * pipelines (north-star brief; not in the reference). Design follows the
  * classic shingle → minhash → band → bucket-join shape (Broder '97;
  * Leskovec et al., "Mining of Massive Datasets" ch. 3).
  *
  * Everything is a deterministic Column expression over a portable 60-bit
  * hash (first 15 hex chars of md5), so a SQL oracle can replay the exact
  * signatures — no JVM-specific hashing.
  *
  * Scale design: candidate generation NEVER does an all-pairs join. Docs
  * explode to (band, bandHash) keys — b rows per doc — and candidates are
  * the within-bucket pairs of a self-equi-join on that key (shuffle keyed
  * by band hash, so co-bucketed docs land together). Exact Jaccard
  * verification then touches only candidate pairs. At 100 TB: band-key
  * cardinality ~ docs×b spread uniformly by md5, no hot keys unless true
  * duplicate clusters exist (those are the rows you want together anyway);
  * a giant duplicate cluster can be capped with a per-bucket limit before
  * the pair join.
  */
object MinHashLSH {

  /** Distinct character k-shingles of a text column. */
  def shingles(text: Column, k: Int = 5): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => text.substr(i, lit(k))))

  /** Portable 60-bit hash: first 15 hex chars of md5("<seed>:<s>"). */
  def hash60(seed: Int, s: Column): Column =
    conv(substring(md5(concat(lit(seed.toString), lit(":"), s)), 1, 15), 16, 10)
      .cast("long")

  /** MinHash signature: for each seed, the min hash over the shingle set. */
  def signature(sh: Column, numHashes: Int = 8): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(sh, s => hash60(i, s)))): _*)

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** (band, bandHash, id) rows: the signature cut into `bands` bands of
    * `rowsPerBand` values, each band hashed to one bucket key. Shingle
    * arrays are NOT carried — only the 3 join columns — so the band
    * shuffle moves ~50 bytes per row regardless of document size.
    *
    * Parameter choice matters for skew: with few rows per band, low-
    * entropy corpora (small vocabularies) make unrelated documents share
    * the corpus-wide minimum shingle hash and collapse into giant buckets
    * (quadratic pair blowup). 4 rows per band keeps the false-candidate
    * probability at j^4 per band, so buckets stay near-dup-only.
    */
  def bandRows(df: DataFrame, idCol: String, textCol: String,
               numHashes: Int = 16, bands: Int = 4, shingleK: Int = 7): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    df.select(col(idCol), shingles(col(textCol), shingleK).as("sh"))
      .withColumn("sig", signature(col("sh"), numHashes))
      .select(col(idCol),
        posexplode(array((0 until bands).map { b =>
          md5(concat_ws("-",
            (0 until rowsPerBand).map(r =>
              col("sig").getItem(b * rowsPerBand + r).cast("string")): _*))
        }: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
  }

  /** Candidate pairs (a < b) sharing at least one LSH bucket — id pairs
    * only; verification re-joins the shingles afterwards.
    */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     numHashes: Int = 16, bands: Int = 4,
                     shingleK: Int = 7): DataFrame = {
    val rows = bandRows(df, idCol, textCol, numHashes, bands, shingleK)
    val left = rows.select(col("band"), col("band_hash"), col(idCol).as("a"))
    val right = rows.select(col("band"), col("band_hash"), col(idCol).as("b"))
    left.join(right, Seq("band", "band_hash"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
  }

  /** Near-duplicate pairs: LSH candidates verified by exact Jaccard.
    * Only candidate pairs ever touch full shingle sets (two id-keyed
    * joins), so the expensive comparison is linear in candidates, not in
    * corpus size squared.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, numHashes: Int = 16, bands: Int = 4,
                   shingleK: Int = 7): DataFrame = {
    val sh = df.select(col(idCol).as("_sid"), shingles(col(textCol), shingleK).as("_sh"))
    candidatePairs(df, idCol, textCol, numHashes, bands, shingleK)
      .join(sh.select(col("_sid").as("a"), col("_sh").as("sh_a")), Seq("a"))
      .join(sh.select(col("_sid").as("b"), col("_sh").as("sh_b")), Seq("b"))
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= threshold)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jaccard"))
  }
}
