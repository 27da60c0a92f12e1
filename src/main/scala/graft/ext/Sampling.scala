package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data pipelines
  * (north-star brief): every decision is a pure function of the row KEY,
  * so samples are reproducible across runs, machines, and engines — the
  * property that matters at 100 TB, where "rerun with a random seed"
  * means a different trillion-token corpus. Built on the portable 60-bit
  * md5 hash ([[MinHashLSH.hash60]]), so a SQL oracle replays every
  * decision bit-for-bit.
  *
  * Scale notes: everything here is a stateless projection/filter over the
  * scan — no shuffle, no sort, no driver state; the sample predicate
  * pushes into the scan's filter stage and composes with partition
  * pruning. Stratified rates ride a broadcast literal map, not a join.
  */
object Sampling {

  /** Uniform-ish hash fraction of a key in [0, 1): the 60-bit md5 hash
    * divided by 2^60. One double division — SQL engines reproduce it
    * exactly.
    */
  def hashFraction(key: Column, seed: Int = 0): Column =
    MinHashLSH.hash60(seed, key.cast("string")).cast("double") /
      lit((1L << 60).toDouble)

  /** Keep rows whose key hashes under `rate` — a deterministic sample of
    * ~rate of the data, stable under reruns and row-order changes.
    */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
                 seed: Int = 0): DataFrame =
    df.filter(hashFraction(col(keyCol), seed) < rate)

  /** Per-class sampling rates (e.g. downsample a dominant language):
    * class → rate, `default` for unlisted classes. The rate lookup is a
    * literal when-chain — no join, pure codegen.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, classCol: String,
                       rates: Map[String, Double], default: Double = 0.0,
                       seed: Int = 0): DataFrame = {
    val rate = rates.foldRight(lit(default)) { case ((cls, r), rest) =>
      when(col(classCol) === cls, lit(r)).otherwise(rest)
    }
    df.filter(hashFraction(col(keyCol), seed) < rate)
  }

  /** Assign every row to a named split (train/val/test, ...) by where its
    * hash fraction lands in the cumulative weight intervals. Weights need
    * not sum to 1 — they are normalized; the LAST split absorbs the
    * boundary so every row gets exactly one label.
    */
  def splitByHash(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)],
                  seed: Int = 0): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty with positive weights")
    val bounds = splitBounds(splits)
    val frac = hashFraction(col(keyCol), seed)
    val label = splits.init.zip(bounds.init).foldRight(lit(splits.last._1)) {
      case (((name, _), bound), rest) => when(frac < bound, lit(name)).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** The cumulative normalized interval bounds [[splitByHash]] compares
    * against — public so an external replay (the SQL oracle) can embed
    * the EXACT same doubles rather than re-deriving them with different
    * rounding.
    */
  def splitBounds(splits: Seq[(String, Double)]): Seq[Double] = {
    val total = splits.map(_._2).sum
    splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
  }
}
