package graft

import org.apache.spark.sql.DataFrame
import graft.ext.ManifestTable

/** NDV sketches in the manifest + manifest-proven broadcast sizing
  * (VERDICT r13 order #7): tracked columns carry a mergeable HLL
  * sketch per file as manifest lines, so table-level distinct-count
  * estimates are pure driver-side metadata math (`metaNdv`, the
  * `detail().ndv` column) — zero data I/O, zero jobs — and survive
  * compaction, CoW rewrites and cold replay. And the join-planning
  * payoff: a small manifest table broadcasts with no manual hint, and
  * a table whose RAW bytes miss the broadcast threshold but whose
  * DV-visible fraction clears it gets the hint from manifest proof.
  */
class NdvBroadcastSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/graft_test/ndv_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  private def docs(ids: Range) = ids
    .map(i => (i.toLong, s"u${i % 37}", s"doc body $i"))
    .toDF("id", "user", "text")

  /** The STATIC join choices (pre-AQE sparkPlan): what the optimizer
    * decided from the logical stats/hints alone — the thing the
    * manifest-proven sizing is supposed to change.
    */
  private def joins(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        "broadcast"
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        "sortmerge"
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        "shufflehash"
    }

  test("tracked NDV: metadata-only estimates, inherited, rewrite-stable, cold") {
    val dir = tmp("track")
    ManifestTable.append(docs(0 until 400), dir, "b0",
      ndvCols = Seq("id", "user"))
    ManifestTable.append(docs(400 until 800), dir, "b1") // inherits
    val s = ManifestTable.snapshot(spark, dir)
    assert(s.ndvCols === Seq("id", "user"))
    assert(s.files.forall(f => s.ndv.get(f).exists(_.keySet == Set("id", "user"))))
    def check(tag: String): Unit = {
      val nd = ManifestTable.metaNdv(spark, dir)
      assert(math.abs(nd("id") - 800L) <= 80L, s"$tag: id ndv ${nd("id")}")
      assert(math.abs(nd("user") - 37L) <= 5L, s"$tag: user ndv ${nd("user")}")
    }
    check("fresh")
    // a conflicting later declaration is a loud error
    intercept[IllegalArgumentException] {
      ManifestTable.append(docs(800 until 810), dir, "b2",
        ndvCols = Seq("text"))
    }
    // rewrites recompute: compaction and a CoW delete keep estimates true
    ManifestTable.compact(spark, dir, targetFileBytes = 8L * 1024,
      clusterBy = Seq("id"))
    check("compacted")
    assert(ManifestTable.deleteWhere(spark, dir, "id >= 700", "d0"))
    def checkDeleted(tag: String): Unit = {
      val nd = ManifestTable.metaNdv(spark, dir)
      assert(math.abs(nd("id") - 700L) <= 70L,
        s"$tag: id ndv ${nd("id")} should track the 700 survivors")
    }
    checkDeleted("post-delete")
    // cold replay (checkpoint/delta lines round-trip the sketches)
    ManifestTable.clearSnapshotCacheForTest()
    checkDeleted("cold")
    // the detail() face surfaces the estimates
    val detail = ManifestTable.detail(spark, dir).collect()(0)
      .getAs[String]("ndv")
    assert(detail != null && detail.contains("id=") &&
      detail.contains("user="), s"detail ndv: $detail")
  }

  test("untracked tables: no sketches, empty metaNdv, null detail column") {
    val dir = tmp("untracked")
    ManifestTable.append(docs(0 until 50), dir, "b0")
    assert(ManifestTable.snapshot(spark, dir).ndv.isEmpty)
    assert(ManifestTable.metaNdv(spark, dir).isEmpty)
    assert(ManifestTable.detail(spark, dir).collect()(0)
      .getAs[String]("ndv") == null)
  }

  test("a small manifest table joins BROADCAST with no manual hint") {
    val dim = tmp("smalldim")
    ManifestTable.append(
      (0L until 37L).map(i => (s"u$i", s"name $i")).toDF("user", "name"),
      dim, "b0")
    val facts = docs(0 until 2000)
    val joined = facts.join(ManifestTable.scan(spark, dim), "user")
    assert(joined.count() === 2000L)
    assert(joins(joined).contains("broadcast"),
      s"small manifest dim did not broadcast: ${joins(joined)}")
  }

  test("DV-heavy table: manifest-proven visible size wins the broadcast") {
    val dir = tmp("dvdim")
    val fat = (0L until 3000L)
      .map(i => (i, s"u${i % 37}", "x" * 64 + i)).toDF("id", "user", "payload")
    ManifestTable.append(fat, dir, "b0")
    val rawBytes = {
      val s = ManifestTable.snapshot(spark, dir)
      s.files.map(s.sizes).sum
    }
    // threshold between the visible slice and the raw bytes: raw size
    // misses it, the DV-visible ~1% fraction clears it
    val threshold = math.max(2048L, rawBytes / 10)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      threshold.toString)
    try {
      val facts = docs(0 until 2000)
      // control: all rows visible, raw bytes over threshold -> shuffle
      val before = facts.join(ManifestTable.scan(spark, dir), "user")
      before.count()
      assert(!joins(before).contains("broadcast"),
        s"control should not broadcast at raw bytes $rawBytes > $threshold")
      // DV-delete 99% (modulo predicate: stats cannot prove coverage,
      // so every file keeps its bytes and earns a vector): disk size
      // unchanged, visibility manifest-proven tiny -> the hint fires
      assert(ManifestTable.deleteWhereDV(spark, dir, "id % 100 != 0", "d0"))
      val s = ManifestTable.snapshot(spark, dir)
      assert(s.dvs.nonEmpty, "fixture degenerate: the delete left no DVs")
      val after = facts.join(ManifestTable.scan(spark, dir), "user")
      assert(after.count() ===
        facts.join(ManifestTable.read(spark, dir), "user").count())
      assert(joins(after).contains("broadcast"),
        s"DV-visible slice under threshold did not broadcast: " +
          s"${joins(after)} (raw $rawBytes, threshold $threshold)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
