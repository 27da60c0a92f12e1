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

  /** (band, bandHash) rows: the signature cut into `bands` bands of
    * `rowsPerBand` values, each band hashed to one bucket key.
    */
  def bandRows(df: DataFrame, idCol: String, textCol: String,
               numHashes: Int = 8, bands: Int = 4, shingleK: Int = 5): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    df.select(col(idCol), shingles(col(textCol), shingleK).as("sh"))
      .withColumn("sig", signature(col("sh"), numHashes))
      .select(col(idCol), col("sh"),
        posexplode(array((0 until bands).map { b =>
          md5(concat_ws("-",
            (0 until rowsPerBand).map(r =>
              col("sig").getItem(b * rowsPerBand + r).cast("string")): _*))
        }: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
  }

  /** Candidate pairs (a < b) sharing at least one LSH bucket. */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     numHashes: Int = 8, bands: Int = 4,
                     shingleK: Int = 5): DataFrame = {
    val left = bandRows(df, idCol, textCol, numHashes, bands, shingleK)
      .select(col("band"), col("band_hash"), col(idCol).as("a"), col("sh").as("sh_a"))
    val right = bandRows(df, idCol, textCol, numHashes, bands, shingleK)
      .select(col("band"), col("band_hash"), col(idCol).as("b"), col("sh").as("sh_b"))
    left.join(right, Seq("band", "band_hash"))
      .filter(col("a") < col("b"))
      .select("a", "b", "sh_a", "sh_b")
      .dropDuplicates("a", "b")
  }

  /** Near-duplicate pairs: LSH candidates verified by exact Jaccard. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, numHashes: Int = 8, bands: Int = 4,
                   shingleK: Int = 5): DataFrame =
    candidatePairs(df, idCol, textCol, numHashes, bands, shingleK)
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= threshold)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jaccard"))
}
