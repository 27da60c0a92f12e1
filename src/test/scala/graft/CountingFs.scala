package graft

import org.apache.hadoop.fs.{FSDataInputStream, Path}

/** A local filesystem registered under the `cfile://` scheme that
  * counts every file OPEN by path — the I/O-level instrument behind the
  * single-pass specs: build a manifest table on a `cfile://` root and
  * the exact number of times each data file was read is observable,
  * whatever plan shape produced the reads.
  */
class CountingFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "cfile"
  override def getUri: java.net.URI = java.net.URI.create("cfile:///")
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    CountingFs.opens
      .computeIfAbsent(f.toUri.getPath,
        _ => new java.util.concurrent.atomic.AtomicLong())
      .incrementAndGet()
    super.open(f, bufferSize)
  }
}

object CountingFs {
  private[graft] val opens = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()

  /** Register the scheme on the session (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.cfile.impl", classOf[CountingFs].getName)

  def reset(): Unit = opens.clear()

  /** Total opens of paths that start with `prefix` and whose file name
    * is in `names` (empty = any name).
    */
  def opensUnder(prefix: String, names: Set[String] = Set.empty): Long = {
    import scala.jdk.CollectionConverters._
    opens.asScala.collect {
      case (path, n) if path.startsWith(prefix) &&
        (names.isEmpty || names.contains(path.split('/').last)) =>
        n.get()
    }.sum
  }
}
