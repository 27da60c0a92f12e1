package graft

import graft.core.JobControl

/** T3 timeout semantics: a runaway folder job is cancelled via its job
  * group (the Spark-native form of the reference's 7,200 s subprocess
  * kill, batch_auto_translate.py:130) and the session survives.
  */
class JobControlSpec extends SparkSpec {

  test("withTimeout cancels the group and the session stays healthy") {
    val slow = spark.range(0, 8, 1, 8).rdd.mapPartitions { it =>
      Thread.sleep(60000); it
    }
    val t0 = System.nanoTime()
    val ex = intercept[Exception] {
      JobControl.withTimeout(spark, "slow-folder", timeoutMs = 1500) {
        slow.count()
      }
    }
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(elapsedSec < 30, s"cancellation took ${elapsedSec}s — not interrupted")
    assert(ex.getMessage != null)
    // the same session runs the next job untouched
    assert(spark.range(10).count() === 10L)
  }

  test("a body that finishes in time returns its value") {
    val n = JobControl.withTimeout(spark, "fast-folder", timeoutMs = 60000) {
      spark.range(5).count()
    }
    assert(n === 5L)
  }
}
