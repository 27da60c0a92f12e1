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
    assert(ManifestTable.vacuum(spark, dir) >= 1)
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
    assert(ManifestTable.vacuum(spark, dir) === 4)
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
    assert(ManifestTable.vacuum(spark, dir) >= 1)
    assert(rows(dir) === Seq((1L, "doc 1"), (2L, "doc 2"), (9L, "doc 9")))
  }
}
