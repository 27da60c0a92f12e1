package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def hasExchange(df: DataFrame): Boolean = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case _: ShuffleExchangeExec   => true
      case other => other.children.exists(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  private def withParquet[A](rows: Int)(f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("tables_spec").toString
    (1 to rows).toDF("v").coalesce(1).write.mode("overwrite").parquet(dir)
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("spread adds a round-robin exchange on a sub-threshold scan") {
    withParquet(100) { dir =>
      val df = Tables.spread(spark.read.parquet(dir))
      assert(hasExchange(df))
      assert(df.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
      assert(df.count() === 100)
    }
  }

  test("spread is the identity above the threshold (no new exchange)") {
    withParquet(100) { dir =>
      // a large production relation is modeled by dropping the threshold
      // under the file size: same code path as a >=128MiB input
      spark.conf.set("graft.spread.threshold", "1")
      try {
        val df = Tables.spread(spark.read.parquet(dir))
        assert(!hasExchange(df))
      } finally spark.conf.unset("graft.spread.threshold")
    }
  }

  test("filters still push down to the scan through spread") {
    withParquet(100) { dir =>
      val df = Tables.spread(spark.read.parquet(dir)).filter($"v" > 90)
      def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(scansOf)
      }
      val scans = scansOf(df.queryExecution.executedPlan)
      assert(scans.nonEmpty)
      assert(scans.head.metadata("PushedFilters").contains("GreaterThan"),
        scans.head.metadata("PushedFilters"))
      assert(df.count() === 10)
    }
  }
}
