package graft.ext

import org.apache.spark.sql.SparkSession

/** Small-files compaction — the table-maintenance pass every long-lived
  * ingest needs: streaming sinks and per-batch appends accumulate
  * thousands of KB-sized parquet files, and at 100 TB the scan cost is
  * dominated by file-open/footer overhead rather than bytes. Compaction
  * rewrites the directory's files into files of ~`targetFileBytes` each
  * (repartition count = ceil(total bytes / target), so the shuffle is
  * the data ONCE and the result is balanced regardless of input skew).
  *
  * Concurrency contract (ADVICE r8 — the previous whole-directory
  * rename both destroyed concurrent appends and left a no-directory
  * window):
  *   - Only the files LISTED at snapshot time are read and later
  *     deleted. A writer appending new files while the compaction runs
  *     loses nothing — its files are simply not part of this pass.
  *   - The rewrite is staged INSIDE the directory under a `_`-prefixed
  *     name, which parquet readers ignore, then the staged part files
  *     are moved up and the listed originals deleted. A concurrent
  *     reader therefore always lists a COMPLETE table; during the brief
  *     move-in/delete window it can observe compacted rows twice
  *     (at-least-once, never at-most-once — for an idempotent consumer
  *     like [[graft.streaming.StreamDedup.dedupAgainstIndex]]'s
  *     anti-join the duplicate window is invisible; a row-counting
  *     reader should not race a compaction). A table format
  *     (Delta/Iceberg) supplies the single atomic commit in production;
  *     this is the strongest ordering plain directories offer —
  *     [[ManifestTable]] is the in-repo manifest-committed layer that
  *     closes the window when atomicity matters more than raw appends.
  *   - Flat directories only: a partitioned (subdirectory) layout would
  *     silently lose its partition columns on rewrite, so it is
  *     rejected (`IllegalArgumentException`) rather than flattened.
  */
object Compact {

  /** Rewrite the flat parquet directory at `path` in place. Returns
    * (input file count, output file count). No-op on an empty or
    * already-single-file directory only in the sense that the rewrite
    * still runs; callers gate on file count if they want cheap skips.
    *
    * @param beforeSwap test seam, invoked after the staged rewrite is
    *                   complete and before any visible file moves —
    *                   specs use it to interleave a concurrent
    *                   reader/writer deterministically.
    */
  def compactParquet(spark: SparkSession, path: String,
                     targetFileBytes: Long = 128L * 1024 * 1024,
                     beforeSwap: () => Unit = () => ()): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be > 0")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path)
    val entries = fs.listStatus(dir)
    val hidden = (n: String) => n.startsWith("_") || n.startsWith(".")
    val subdirs = entries.filter(e => e.isDirectory && !hidden(e.getPath.getName))
    require(subdirs.isEmpty,
      s"compactParquet requires a flat layout; $path has data subdirectories " +
        s"(${subdirs.take(3).map(_.getPath.getName).mkString(", ")}…) — a " +
        "rewrite would flatten the partition columns. Compact each leaf " +
        "partition directory instead.")
    val parts = entries
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (parts.isEmpty) { beforeSwap(); return (0, 0) }
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val stage = new org.apache.hadoop.fs.Path(s"$path/_compact_stage")
    fs.delete(stage, true)
    // Read ONLY the snapshot — files appended after this listing are
    // neither rewritten nor deleted.
    spark.read.parquet(parts.map(_.getPath.toString).toIndexedSeq: _*)
      .repartition(nOut)
      .write.parquet(stage.toString)
    beforeSwap()
    // Move staged parts up (their writer-UUID names cannot collide with
    // the originals), then drop the originals. Readers between the two
    // steps see a complete table, possibly with the compacted rows twice.
    fs.listStatus(stage)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach(s => fs.rename(s.getPath,
        new org.apache.hadoop.fs.Path(dir, s.getPath.getName)))
    parts.foreach(p => fs.delete(p.getPath, false))
    fs.delete(stage, true)
    (parts.length, nOut)
  }
}
