package graft

import org.apache.spark.sql.functions._
import graft.ext.ManifestTable

/** The manifest-committed table's contract: snapshot visibility is a
  * manifest swap — batch appends are idempotent by id, a crash between
  * data write and commit leaves orphans (not rows), compaction is atomic
  * to concurrent readers, vacuum removes only unreferenced files.
  */
class ManifestTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/graft_test/manifest_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  private def rows(dir: String): Seq[(Long, String)] =
    ManifestTable.read(spark, dir).as[(Long, String)]
      .collect().toSeq.sorted

  private def batch(ids: Long*): org.apache.spark.sql.DataFrame =
    ids.map(i => (i, s"doc $i")).toDF("id", "text")

  test("appends commit atomically and replayed batch ids are no-ops") {
    val dir = tmp("append")
    assert(ManifestTable.append(batch(1, 2), dir, "b0"))
    assert(ManifestTable.append(batch(3), dir, "b1"))
    assert(rows(dir) === Seq((1L, "doc 1"), (2L, "doc 2"), (3L, "doc 3")))
    // crash-replay of b1: absorbed id, nothing committed, rows unchanged
    assert(!ManifestTable.append(batch(3), dir, "b1"))
    assert(rows(dir) === Seq((1L, "doc 1"), (2L, "doc 2"), (3L, "doc 3")))
    assert(ManifestTable.snapshot(spark, dir).version === 2L)
  }

  test("a crash between data write and commit leaves orphan files, not rows") {
    val dir = tmp("crash")
    ManifestTable.append(batch(1), dir, "b0")
    intercept[RuntimeException] {
      ManifestTable.append(batch(2), dir, "b1",
        beforeCommit = () => throw new RuntimeException("crash"))
    }
    // the un-committed batch is INVISIBLE — no at-least-once window
    assert(rows(dir) === Seq((1L, "doc 1")))
    // vacuum sweeps the orphaned data files; the table is untouched
    assert(ManifestTable.vacuum(spark, dir, graceMs = 0L) >= 1)
    assert(rows(dir) === Seq((1L, "doc 1")))
    // the replay AFTER the crash commits normally (its id never landed)
    assert(ManifestTable.append(batch(2), dir, "b1"))
    assert(rows(dir) === Seq((1L, "doc 1"), (2L, "doc 2")))
  }

  test("compaction is one atomic swap: a concurrent reader never sees duplicates") {
    val dir = tmp("compact")
    (0 until 4).foreach(i => ManifestTable.append(batch(i.toLong), dir, s"b$i"))
    val before = rows(dir)
    var midRows: Seq[(Long, String)] = null
    val (nin, nout) = ManifestTable.compact(spark, dir,
      targetFileBytes = 1024L * 1024 * 1024,
      beforeSwap = () => { midRows = rows(dir) })
    // mid-compaction (rewrite done, swap not yet): EXACTLY the old
    // snapshot — Compact's transient-duplicate window does not exist here
    assert(midRows === before)
    assert(nin === 4 && nout === 1)
    assert(rows(dir) === before)
    // batch-id history survives compaction: replays stay no-ops
    assert(!ManifestTable.append(batch(0), dir, "b0"))
    // old files are orphans now; vacuum removes them, content unchanged
    assert(ManifestTable.vacuum(spark, dir, graceMs = 0L) === 4)
    assert(rows(dir) === before)
  }

  test("concurrent append during compaction carries over untouched") {
    val dir = tmp("concurrent")
    ManifestTable.append(batch(1, 2), dir, "b0")
    ManifestTable.compact(spark, dir, targetFileBytes = 1024L * 1024 * 1024,
      beforeSwap = () => { ManifestTable.append(batch(9), dir, "late") })
    // the file appended mid-compaction is in the head manifest the swap
    // rebased onto — the compaction replaces only the files it rewrote
    assert(rows(dir) === Seq((1L, "doc 1"), (2L, "doc 2"), (9L, "doc 9")))
    assert(ManifestTable.vacuum(spark, dir, graceMs = 0L) >= 1)
    assert(rows(dir) === Seq((1L, "doc 1"), (2L, "doc 2"), (9L, "doc 9")))
  }

  test("conflicting concurrent compactions: the loser aborts, no duplicated rows") {
    val dir = tmp("compactrace")
    (0 until 4).foreach(i => ManifestTable.append(batch(i.toLong), dir, s"b$i"))
    val before = rows(dir)
    // compaction B completes INSIDE compaction A's rewrite->swap window,
    // replacing every file A read; A's rebase-and-commit would land a
    // second copy of all 4 rows, so A must abort instead
    var bResult: (Int, Int) = null
    val aResult = ManifestTable.compact(spark, dir,
      targetFileBytes = 1024L * 1024 * 1024,
      beforeSwap = () => {
        bResult = ManifestTable.compact(spark, dir,
          targetFileBytes = 1024L * 1024 * 1024)
      })
    assert(bResult === ((4, 1)))
    assert(aResult === ((0, 0)))
    assert(rows(dir) === before)
    // A's rewrite and the 4 originals are orphans; vacuum sweeps them
    // and the single committed copy remains
    assert(ManifestTable.vacuum(spark, dir, graceMs = 0L) >= 5)
    assert(rows(dir) === before)
  }

  test("vacuum grace window protects in-flight appends and pinned readers") {
    val dir = tmp("grace")
    ManifestTable.append(batch(1), dir, "b0")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    // an in-flight append's data file: moved into data/ but not yet in
    // any manifest (the pre-commit window ADVICE r9 flags)
    val inflight = new org.apache.hadoop.fs.Path(s"$dir/data/inflight.parquet")
    fs.create(inflight, true).close()
    // a pinned reader's files: compact orphans the v1 file
    val pinned = ManifestTable.read(spark, dir)
    ManifestTable.compact(spark, dir, targetFileBytes = 1024L * 1024 * 1024)
    // graceful vacuum (files are seconds old): deletes NOTHING — the
    // in-flight append can still commit, the pinned reader still scans
    assert(ManifestTable.vacuum(spark, dir) === 0)
    assert(fs.exists(inflight))
    assert(pinned.as[(Long, String)].collect().toSeq === Seq((1L, "doc 1")))
    // past the grace window (grace 0) both orphans go
    assert(ManifestTable.vacuum(spark, dir, graceMs = 0L) >= 2)
    assert(!fs.exists(inflight))
    assert(rows(dir) === Seq((1L, "doc 1")))
  }
}
