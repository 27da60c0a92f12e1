package graft

import org.apache.spark.sql.functions._
import graft.ext.Bucketing

/** Bucketed co-located joins: same results as a plain join, with the
  * exchanges eliminated by the storage layout — the property that makes
  * repeated big-big joins viable at 100 TB.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed equi-join matches the plain join and has no exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    val left = Seq.tabulate(200)(i => (i.toLong % 50, s"left_$i"))
      .toDF("k", "lv")
    val right = Seq.tabulate(300)(i => (i.toLong % 50, i.toLong))
      .toDF("k", "rv")

    Bucketing.writeBucketed(left, "bspec_left", s"$dir/left", "k", buckets = 4)
    Bucketing.writeBucketed(right, "bspec_right", s"$dir/right", "k", buckets = 4)

    // disable auto-broadcast so both joins take the sort-merge path the
    // bucketing is designed for (tiny spec frames would broadcast)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val bucketed = Bucketing.bucketedEquiJoin(spark, "bspec_left", "bspec_right", "k")
    val plain = left.join(right, "k")
    assert(bucketed.count() === plain.count())
    assert(bucketed.agg(sum("rv")).head().getLong(0) ===
      plain.agg(sum("rv")).head().getLong(0))

    // the layout satisfies the join's distribution requirement: no
    // shuffle on either side of the bucketed plan...
    val bucketedPlan = bucketed.queryExecution.executedPlan.toString
    assert(!bucketedPlan.contains("Exchange"),
      s"bucketed join plan still shuffles:\n$bucketedPlan")
    // ...whereas the plain join must shuffle at least one side
    val plainPlan = plain.queryExecution.executedPlan.toString
    assert(plainPlan.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
