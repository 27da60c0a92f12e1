package graft

import graft.ext.ManifestTable

/** BIN-PACKING compaction (`compactSmall`): only under-sized files
  * rewrite — the O(small bytes) maintenance pass a streaming-sink table
  * runs on a cadence, vs `compact`'s O(table) rewrite — plus a
  * many-writer CAS stress: concurrent appenders all land exactly once.
  */
class ManifestCompactSmallSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/graft_test/mpack_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  private def wide(ids: Range) =
    ids.map(i => (i.toLong, (i to i + 40).mkString(" "))).toDF("id", "text")

  test("packs only the small files; right-sized files survive byte-identical") {
    val dir = tmp("pack")
    // one big clustered file set...
    ManifestTable.append(wide(0 until 3000).coalesce(1), dir, "big")
    // ...then a trickle of small appends (the streaming-sink shape)
    (0 until 6).foreach(k =>
      ManifestTable.append(wide(3000 + k * 10 until 3000 + k * 10 + 10)
        .coalesce(1), dir, s"small$k"))
    val s0 = ManifestTable.snapshot(spark, dir)
    val bigFiles = s0.files.filter(f => s0.sizes(f) >= 8L * 1024).toSet
    val smallFiles = s0.files.filterNot(bigFiles).toSet
    assert(bigFiles.nonEmpty && smallFiles.size >= 6)
    val (in, out) = ManifestTable.compactSmall(spark, dir,
      targetFileBytes = 1024L * 1024, minFileBytes = 8L * 1024)
    assert(in === smallFiles.size && out >= 1 && out < in)
    val s1 = ManifestTable.snapshot(spark, dir)
    // the big files were never touched — same names, same recorded sizes
    bigFiles.foreach { f =>
      assert(s1.files.contains(f) && s1.sizes(f) === s0.sizes(f))
    }
    smallFiles.foreach(f => assert(!s1.files.contains(f)))
    assert(ManifestTable.read(spark, dir).count() === 3060L)
    // a row-preserving rewrite: the feeds skip it like any compaction
    assert(ManifestTable.appendsBetween(spark, dir,
      s0.version, s1.version).count() === 0L)
    // idempotent maintenance: nothing small remains, second pass no-ops
    assert(ManifestTable.compactSmall(spark, dir,
      targetFileBytes = 1024L * 1024, minFileBytes = 8L * 1024) === ((0, 0)))
  }

  test("packing a partitioned table preserves the one-tuple-per-file invariant") {
    val dir = tmp("part")
    def b(ids: Range) = ids
      .map(i => (i.toLong, Seq("sf", "nyc")((i % 2).toInt),
        (i to i + 40).mkString(" ")))
      .toDF("id", "city", "text")
    ManifestTable.append(b(0 until 40).coalesce(1), dir, "b0",
      partitionBy = Seq("city"))
    (0 until 4).foreach(k =>
      ManifestTable.append(b(40 + k * 10 until 50 + k * 10).coalesce(1),
        dir, s"s$k"))
    val (in, out) = ManifestTable.compactSmall(spark, dir,
      targetFileBytes = 1024L * 1024, minFileBytes = 1024L * 1024)
    assert(in >= 2 && out >= 1)
    val s1 = ManifestTable.snapshot(spark, dir)
    s1.files.foreach(f => assert(
      s1.pvals.get(f).exists(_.contains("city")),
      "packing lost a file's partition tuple"))
    assert(ManifestTable.read(spark, dir)
      .where("city = 'sf'").count() === 40L)
  }

  test("a DV'd small file rewrites through the applied view; vector retires") {
    val dir = tmp("dv")
    ManifestTable.append(wide(0 until 20).coalesce(1), dir, "b0")
    ManifestTable.append(wide(20 until 40).coalesce(1), dir, "b1")
    assert(ManifestTable.deleteWhereDV(spark, dir, "id = 5", "d0"))
    val (in, _) = ManifestTable.compactSmall(spark, dir,
      targetFileBytes = 1024L * 1024, minFileBytes = 1024L * 1024)
    assert(in === 2)
    val s1 = ManifestTable.snapshot(spark, dir)
    assert(s1.dvs.isEmpty, "packing left a vector on a retired file")
    assert(ManifestTable.read(spark, dir).select("id").as[Long]
      .collect().toSeq.sorted === (0L until 40L).filterNot(_ == 5L))
  }

  test("one small file is left alone (packing one buys nothing)") {
    val dir = tmp("one")
    ManifestTable.append(wide(0 until 10).coalesce(1), dir, "b0")
    assert(ManifestTable.compactSmall(spark, dir,
      minFileBytes = 1024L * 1024) === ((0, 0)))
  }

  test("disjoint writers commit in parallel: a DV delete and an append both land") {
    val dir = tmp("parallel")
    ManifestTable.append(wide(0 until 50).coalesce(1), dir, "b0")
    ManifestTable.append(wide(50 until 100).coalesce(1), dir, "b1")
    // the append lands INSIDE the delete's read->commit window; the
    // delete's candidates (b0's file) are untouched by it, so BOTH
    // commit — writer conflicts are per-file, not per-table
    assert(ManifestTable.deleteWhereDV(spark, dir, "id = 7", "d0",
      beforeSwap = () => {
        assert(ManifestTable.append(
          wide(100 until 150).coalesce(1), dir, "b2"))
      }))
    val s = ManifestTable.snapshot(spark, dir)
    assert(s.batchIds === Set("b0", "b1", "b2", "d0"))
    assert(ManifestTable.read(spark, dir).select("id").as[Long]
      .collect().toSeq.sorted === (0L until 150L).filterNot(_ == 7L))
  }

  test("8 concurrent appenders: every batch lands exactly once through the CAS") {
    val dir = tmp("race")
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (0 until 8).map { t =>
        Future {
          (0 until 4).foreach { k =>
            val lo = (t * 4 + k) * 10
            assert(ManifestTable.append(
              wide(lo until lo + 10).coalesce(1), dir, s"b$t-$k"))
          }
        }
      }
      Await.result(Future.sequence(fs), 300.seconds)
    } finally pool.shutdown()
    val s = ManifestTable.snapshot(spark, dir)
    // 32 commits, 32 batches, no version skipped, every row exactly once
    assert(s.version === 32L)
    assert(s.batchIds.size === 32)
    assert(ManifestTable.read(spark, dir).select("id").as[Long]
      .collect().toSeq.sorted === (0L until 320L))
    // and the full replay from a cold cache agrees
    ManifestTable.clearSnapshotCacheForTest()
    assert(ManifestTable.read(spark, dir).count() === 320L)
  }
}
