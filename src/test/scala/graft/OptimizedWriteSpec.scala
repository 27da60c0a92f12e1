package graft

import org.apache.spark.sql.functions._
import graft.ext.ManifestTable

/** The staged-write REBALANCE (optimization guide §6 — small files hurt
  * twice; coalesce on write): a small batch flowing through a many-way
  * session must land as few right-sized files, not one tiny file per
  * input partition; an explicitly sized caller layout (coalesce, keyed
  * repartition, the maintenance rewrites) is respected; the conf kill
  * switch restores the raw pass-through.
  */
class OptimizedWriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/graft_test/ow_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  test("a small append collapses to one file regardless of input partitioning") {
    val dir = tmp("collapse")
    ManifestTable.append(
      spark.range(1000).toDF("id").repartition(32), dir, "b0")
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.files.size === 1,
      s"a tiny 32-partition batch wrote ${snap.files.size} files")
    assert(ManifestTable.read(spark, dir).count() === 1000L)
  }

  test("an explicit coalesce(n) is caller layout and wins over the rebalance") {
    val dir = tmp("coalesce")
    ManifestTable.append(
      spark.range(1000).toDF("id").repartition(32).coalesce(4), dir, "b0")
    assert(ManifestTable.snapshot(spark, dir).files.size === 4)
  }

  test("a partitioned small append writes ~one file per partition value") {
    val dir = tmp("partitioned")
    val df = spark.range(1000)
      .select(col("id"), (col("id") % 5).cast("string").as("grp"))
      .repartition(32)
    ManifestTable.append(df, dir, "b0", partitionBy = Seq("grp"))
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.files.size === 5,
      s"expected one file per grp value, got ${snap.files.size}")
    assert(snap.files.forall(f => snap.pvals.get(f).exists(_.contains("grp"))))
    assert(ManifestTable.read(spark, dir).count() === 1000L)
  }

  test("graft.write.rebalance=false restores the raw pass-through") {
    val dir = tmp("off")
    spark.conf.set("graft.write.rebalance", "false")
    try {
      ManifestTable.append(
        spark.range(1000).toDF("id").repartition(8), dir, "b0")
      assert(ManifestTable.snapshot(spark, dir).files.size === 8)
    } finally spark.conf.unset("graft.write.rebalance")
  }

  test("compact still sizes its own output under the rebalance") {
    val dir = tmp("compact")
    ManifestTable.append(
      (0L until 4000L).map(i => (i, s"ballast text for row $i")).toDF("id", "text"),
      dir, "b0")
    ManifestTable.compact(spark, dir, targetFileBytes = 4L * 1024,
      clusterBy = Seq("id"))
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.files.size > 4,
      s"4KB-target compaction must split (got ${snap.files.size} files)")
  }
}
