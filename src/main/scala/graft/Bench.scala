package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark harness. Prints ONE JSON line and (full runs only) writes it to
  * BENCH.json.
  *
  * Measurement rules (each earned the hard way in earlier rounds):
  *   - Queries run in sorted-name order, so run order is stable as queries are
  *     added. A Scala `Map`'s hash order reshuffled every round and parked the
  *     one-off JVM/Janino warmup on whichever queries happened to come first,
  *     manufacturing phantom 5-18x regressions.
  *   - Each query runs four times: a first pass (JIT + codegen compile,
  *     published as `cold`), then three timed passes whose MEDIAN is
  *     published as `queries`. A single warm sample proved untrustworthy
  *     (round 5 recorded a warm pass 16x its own cold pass — a GC/compiler
  *     hiccup, not the query); the median of three absorbs one outlier.
  *   - The action is a noop-sink write, not `count()`: count() lets Catalyst
  *     prune the final projection and drop top-level sorts, so
  *     projection-heavy queries timed as if they computed nothing.
  *   - Operator-persisted intermediates are dropped between passes, so the
  *     timed pass measures the query (warm JIT, cold data), not a cache hit.
  */
object Bench {
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Box-load snapshot for the ledger (VERDICT r7 #1: two same-day runs
    * of the same suite disagreed 65.9 s vs 97.3 s — uniform deltas across
    * even trivial queries, i.e. machine noise, not plans; the ledger must
    * carry the evidence). 1-minute loadavg and MemAvailable, read from
    * /proc; -1 when unreadable (non-Linux).
    */
  private def loadSnapshot(): (Double, Long) = {
    def readFirstLine(p: String): Option[String] =
      try Some(java.nio.file.Files.readString(java.nio.file.Paths.get(p)).linesIterator.next())
      catch { case _: Throwable => None }
    val load = readFirstLine("/proc/loadavg")
      .flatMap(_.split(" ").headOption).flatMap(_.toDoubleOption).getOrElse(-1.0)
    val memKb =
      (try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/meminfo"))
          .linesIterator.find(_.startsWith("MemAvailable:"))
       catch { case _: Throwable => None })
        .flatMap(_.split("\\s+").lift(1)).flatMap(_.toLongOption).getOrElse(-1L)
    (load, memKb)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (loadStart, memStart) = loadSnapshot()
    // One untimed scan so the very first cold number isn't session startup.
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => }
    // Session-memoized fixtures (s5/t3 CSV folders, j7 bucketed tables)
    // build BEFORE any timing, so the cold column measures the engine's
    // first execution, not fixture I/O (VERDICT r7 #7).
    try graft.queries.OpsQueries.prewarmFixtures(spark, sfDir)
    catch { case _: Throwable => }
    // Optional args: run only the named queries (dev loop); full run when empty.
    val selected =
      (if (args.isEmpty) SparkEntry.queries
       else SparkEntry.queries.view.filterKeys(args.toSet).toMap)
        .toSeq.sortBy(_._1)
    val results = selected.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try materialize(fn(spark, sfDir))
        catch { case _: Throwable => return -1.0 }
        finally graft.core.Caches.release()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm =
        if (cold < 0) cold
        else {
          val samples = Seq.fill(3)(once())
          if (samples.exists(_ < 0)) -1.0 else samples.sorted.apply(1)
        }
      (name, cold, warm)
    }
    def jsonMap(f: ((String, Double, Double)) => Double): String =
      results.map { case r @ (k, _, _) => s"\"" + k + "\":" + f(r) }
        .mkString("{", ",", "}")
    val qs = jsonMap(_._3)
    val colds = jsonMap(_._2)
    val total = results.map(_._3).filter(_ >= 0).sum
    val (loadEnd, memEnd) = loadSnapshot()
    val env =
      s""""load":{"loadavg1_start":$loadStart,"loadavg1_end":$loadEnd,""" +
        s""""mem_available_kb_start":$memStart,"mem_available_kb_end":$memEnd}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold":$colds,$env,"sf":"$sfDir"}"""
    // stdout line may get wrapped in sbt's "[info] " prefix; also write a
    // bare JSON file so parsers never depend on log scraping.
    println(line)
    if (args.isEmpty)  // a filtered dev run must not clobber the full ledger
      java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.json"), line + "\n")
    spark.stop()
  }
}
