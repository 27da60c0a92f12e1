package graft.ext

import org.apache.spark.sql.SparkSession

/** Small-files compaction — the table-maintenance pass every long-lived
  * ingest needs: streaming sinks and per-batch appends accumulate
  * thousands of KB-sized parquet files, and at 100 TB the scan cost is
  * dominated by file-open/footer overhead rather than bytes. Compaction
  * rewrites a directory into files of ~`targetFileBytes` each
  * (repartition count = ceil(total bytes / target), so the shuffle is
  * the data ONCE and the result is balanced regardless of input skew),
  * staged fully before a rename swap so concurrent readers never see a
  * half-written table — the same stage+swap discipline as
  * [[graft.operators.Tracking.upsert]], with the same caveat that the
  * two renames are not one atomic commit (a table format supplies that
  * in production).
  */
object Compact {

  /** Rewrite the parquet directory at `path` in place. Returns
    * (input file count, output file count).
    */
  def compactParquet(spark: SparkSession, path: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be > 0")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path)
    val parts = fs.listStatus(dir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val stage = new org.apache.hadoop.fs.Path(s"$path/_compact_stage")
    val old = new org.apache.hadoop.fs.Path(s"${path}_precompact")
    fs.delete(stage, true)
    spark.read.parquet(path).repartition(nOut)
      .write.parquet(stage.toString)
    fs.delete(old, true)
    fs.rename(dir, old)
    fs.rename(new org.apache.hadoop.fs.Path(s"$old/_compact_stage"), dir)
    fs.delete(old, true)
    (parts.length, nOut)
  }
}
