package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter sidecar files for an append-only segmented index — the
  * shared routing layer under [[Ingest]] (fingerprints) and
  * [[NearDupSink]] (band hashes). One `.bloom` file per appended
  * segment; readers merge every file into ONE in-memory filter.
  *
  * A sidecar never DECIDES membership: a positive routes rows to the
  * precise anti-join/probe, a negative proves absence (blooms have no
  * false negatives). So a missing or stale sidecar — crash between the
  * segment write and the bloom write, a saturated filter — costs probe
  * latency, never data.
  */
private[streaming] object BloomSidecar {

  /** Fixed geometry for every sidecar filter, so any set of them merges
    * (`mergeInPlace` requires identical bit size + hash count). ~1.2 MB
    * per filter; a segment with more items than `ExpectedItems` only
    * degrades the false-positive rate — more rows pay the precise
    * probe — never correctness.
    */
  val ExpectedItems = 1000000L
  val Fpp = 0.01

  private def fs(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def bloomFiles(spark: SparkSession, dir: String) = {
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!f.exists(p)) Array.empty[org.apache.hadoop.fs.FileStatus]
    else f.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".bloom"))
  }

  /** The union of every sidecar at `dir`, or None if there are none.
    * Driver memory is ONE filter regardless of segment count — files
    * merge as they stream in.
    */
  def read(spark: SparkSession, dir: String): Option[BloomFilter] = {
    val files = bloomFiles(spark, dir)
    if (files.isEmpty) return None
    val f = fs(spark, dir)
    Some(files.map { s =>
      val in = f.open(s.getPath)
      try BloomFilter.readFrom(in) finally in.close()
    }.reduce { (a, b) => a.mergeInPlace(b); a })
  }

  def write(spark: SparkSession, dir: String, bf: BloomFilter): Unit = {
    val out = fs(spark, dir).create(new org.apache.hadoop.fs.Path(
      s"$dir/seg-${java.util.UUID.randomUUID()}.bloom"))
    try bf.writeTo(out) finally out.close()
  }

  /** Distributed build over one string column (executor-side putString,
    * tree-merged; the driver only ever holds merged filters).
    */
  def build(values: DataFrame, colName: String): BloomFilter =
    values.select(colName).na.drop("all").rdd.treeAggregate(
        BloomFilter.create(ExpectedItems, Fpp))(
      (f, row) => { f.putString(row.getString(0)); f },
      (a, b) => { a.mergeInPlace(b); a })

  /** Fold many sidecars into one. Deletes only the files listed at its
    * snapshot, so a sidecar appended mid-fold survives; a crash between
    * the write and the deletes leaves duplicates, and a bloom union is
    * idempotent, so readers are correct throughout.
    */
  def fold(spark: SparkSession, dir: String): Unit = {
    val files = bloomFiles(spark, dir)
    if (files.length > 1) {
      val f = fs(spark, dir)
      val merged = files.map { s =>
        val in = f.open(s.getPath)
        try BloomFilter.readFrom(in) finally in.close()
      }.reduce { (a, b) => a.mergeInPlace(b); a }
      write(spark, dir, merged)
      files.foreach(s => f.delete(s.getPath, false))
    }
  }
}
