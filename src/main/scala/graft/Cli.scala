package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Command-line parity with the reference's entry points, so a user of
  * the reference can run the same jobs against this engine:
  *
  *   translate <input.csv> <outDir>     ≙ auto_translate.py <csv> <lang> <out>
  *   analyze   <responses_dir> <outDir> ≙ auto_translate.py analyze <jsonl>
  *   folder    <inDir> <outDir>         ≙ batch_auto_translate.py <in> <lang> <out>
  *   track     <logDir>                 ≙ batch_tracker.py status report
  *
  * The translator is the deterministic mock (this environment is
  * zero-egress); a deployment swaps in an HTTP-backed Translator via the
  * same seam.
  */
object Cli {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, usage)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.register(spark)
    try run(spark, args) finally spark.stop()
  }

  private def usage: String =
    "usage: translate <csv> <outDir> | analyze <respDir> <outDir> | " +
      "folder <inDir> <outDir> | track <logDir>"

  /** Dispatch (separated from main for spec-level invocation). Arity is
    * matched per mode so a wrong argument count fails with the usage
    * string instead of a bare MatchError (ADVICE r2).
    */
  def run(spark: SparkSession, args: Array[String]): Unit = args match {
    case Array("translate", in, out) =>
      val r = Pipeline.runCsv(spark, in, s"$out/translated",
        new graft.translate.MockTranslator())
      Pipeline.writeReports(r, s"$out/reports")

    case Array("analyze", respDir, out) =>
      val flat = sources.JsonlIO.readResponses(spark, respDir)
      operators.Analysis.rollup(flat)
        .write.mode("overwrite").option("header", "true").csv(s"$out/rollup")
      operators.Analysis.summary(flat)
        .write.mode("overwrite").json(s"$out/summary")
      sources.JsonlIO.writeRepaired(flat, s"$out/repaired")

    case Array("folder", in, out) =>
      Pipeline.runFolder(spark, in, new graft.translate.MockTranslator())
        .write.mode("overwrite").partitionBy("source_stem")
        .option("header", "true").csv(s"$out/translated")

    case Array("track", logDir) =>
      val state = operators.Tracking.latestState(
        operators.Tracking.readLog(spark, logDir), col("timestamp"))
      // the reference's status report: counts by status/language + 5 most
      // recent (batch_tracker.py:111-134)
      state.groupBy("status").count().orderBy("status").show(false)
      state.groupBy("target_language").count().orderBy("target_language").show(false)
      state.orderBy(col("timestamp").desc).limit(5).show(false)

    case _ => throw new IllegalArgumentException(
      s"bad arguments '${args.mkString(" ")}'; $usage")
  }
}
