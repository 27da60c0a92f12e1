package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's TPC-H-ish testdata tables (see TESTDATA.md).
  *
  * All reads are plain parquet scans — Catalyst pushes filters/projections
  * into the scan, so callers should NOT pre-materialize or cache here.
  * At 100 TB these would be partitioned tables; the loader keeps the read
  * declarative so partition pruning applies when a `dt=`-style layout exists.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark refuses by default;
    // read nanos as long and normalize below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      // `ts_ns` keeps exact nanosecond epoch (safe for ordering/compares
      // against a ns-native oracle); `ts` is the usable micros timestamp.
      // `div` is INTEGRAL division — Column `/` is double division, and a
      // ~1.7e18 nanosecond epoch exceeds a double's 53-bit mantissa, so
      // the float path lands ±1 µs off the true floor(ns / 1000)
      df.withColumn("ts_ns", col("ts").cast("long"))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Rebalance a SMALL scan to the session's parallelism before CPU-heavy
    * per-row work (shingling, hashing, signatures). A tiny parquet file is
    * one row group, so Spark's split logic gives it ONE input partition no
    * matter how many cores the session has — and a per-row-expensive
    * projection then runs single-threaded. The repartition is conditional:
    * at production scale the scan already has >= parallelism splits and
    * this is the identity (no shuffle is ever added to a big input); on a
    * small input the round-robin exchange moves only the small input once
    * and buys full-core parallelism for everything downstream.
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
