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
    // events.ts has shipped as TIMESTAMP(NANOS) (which Spark refuses by
    // default — read nanos as long) AND as TIMESTAMP(MICROS) in different
    // testdata generations; normalize BOTH to the same surface below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spread(spark.read.parquet(s"$sfDir/$name.parquet"))
    if (name == "events") {
      // Normalized surface regardless of the file's physical type:
      // `ts` = session-tz TIMESTAMP at micros precision, `ts_ns` = exact
      // nanosecond epoch (matches a ns-native oracle: for micros files
      // epoch_ns is exactly epoch_us * 1000 on both sides).
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // nanos-as-long. `div` is INTEGRAL division — Column `/` is
          // double division, and a ~1.7e18 ns epoch exceeds a double's
          // 53-bit mantissa, so the float path lands ±1 µs off the true
          // floor(ns / 1000).
          df.withColumn("ts_ns", col("ts").cast("long"))
            .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ =>
          // TIMESTAMP(MICROS), surfaced as NTZ (no tz metadata) or LTZ;
          // the NTZ→LTZ cast reads the naive value in the session zone
          // (pinned UTC by every entry point), matching the oracle's
          // naive read of the same file.
          val micros = unix_micros(
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
          df.withColumn("ts_ns", micros * lit(1000L))
            .withColumn("ts", timestamp_micros(micros))
      }
    } else df
  }

  /** Rebalance a SMALL scan to the session's parallelism before CPU-heavy
    * per-row work (shingling, hashing, signatures). A tiny parquet file is
    * typically one row group, so only the split containing the row-group
    * start does any work — a per-row-expensive projection then runs
    * single-threaded no matter how many cores the session has.
    *
    * The repartition is conditional on PLAN-TIME stats (logical-plan
    * `sizeInBytes`, i.e. the relation's file size — no physical planning,
    * no job, unlike `df.rdd.getNumPartitions`): inputs under the threshold
    * (default 128 MiB = the default `spark.sql.files.maxPartitionBytes`,
    * the size below which the scan cannot produce even one full split) get
    * a round-robin
    * exchange that moves only the small input once and buys full-core
    * parallelism for everything downstream. At production scale relations
    * are orders of magnitude over the threshold and this is the identity —
    * no shuffle is ever added to a big input (pinned by TablesSpec).
    * Filters and column pruning still push through the exchange to the
    * scan, so the plan stays pushdown-clean either way.
    *
    * Tunable via `graft.spread.threshold` (bytes; 0 disables).
    */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val threshold = spark.conf.getOption("graft.spread.threshold")
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size < threshold)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
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
