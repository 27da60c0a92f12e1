package graft

import org.apache.spark.sql.functions._
import graft.ext.ManifestTable

/** MERGE-ON-READ row ops (VERDICT r11 #3): a point delete writes a
  * deletion-vector sidecar of O(matched rows), never rewrites a data
  * file; readers apply vectors exactly (stacking included); compaction
  * retires them; time travel, CDC, idempotence, conflicts and the
  * metadata-only count all stay honest around them.
  */
class ManifestDvSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/graft_test/mdv_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  private def table(name: String, n: Long = 100L): String = {
    val dir = tmp(name)
    ManifestTable.append(
      (0L until n).map(x => (x, s"doc $x")).toDF("id", "text").coalesce(2),
      dir, "b0")
    dir
  }

  private def ids(dir: String): Seq[Long] =
    ManifestTable.read(spark, dir).select("id").as[Long]
      .collect().toSeq.sorted

  test("a DV delete removes rows without rewriting ANY data file") {
    val dir = table("point")
    val before = ManifestTable.snapshot(spark, dir)
    assert(ManifestTable.deleteWhereDV(spark, dir, "id = 42", "d0"))
    val after = ManifestTable.snapshot(spark, dir)
    // the write was O(1 row): the data file set is IDENTICAL — no
    // rewrite happened — and the one vector marks exactly one position
    assert(after.files === before.files)
    assert(after.dvs.values.flatten.map(_.rows).sum === 1L)
    assert(ids(dir) === (0L until 100L).filterNot(_ == 42L))
    // replayed opId: no-op
    assert(!ManifestTable.deleteWhereDV(spark, dir, "id = 42", "d0"))
    // SQL three-valued semantics: NULL predicate rows survive
    assert(ManifestTable.deleteWhereDV(spark, dir,
      "CASE WHEN id = 7 THEN true ELSE NULL END", "d1"))
    assert(ids(dir) === (0L until 100L).filterNot(Set(42L, 7L)))
  }

  test("stacked DVs on one file apply together; counts stay additive") {
    val dir = table("stack")
    assert(ManifestTable.deleteWhereDV(spark, dir, "id < 10", "d0"))
    assert(ManifestTable.deleteWhereDV(spark, dir, "id < 20", "d1"))
    assert(ids(dir) === (20L until 100L))
    val s = ManifestTable.snapshot(spark, dir)
    // the second vector marks only the rows the first left visible:
    // totals are additive, nothing double-marked
    assert(s.dvs.values.flatten.map(_.rows).sum === 20L)
    assert(ManifestTable.metaCount(spark, dir) === Some(80L))
    // time travel ignores vectors committed later
    assert(ManifestTable.readVersion(spark, dir, 1L).count() === 100L)
    assert(ManifestTable.readVersion(spark, dir, 2L).count() === 90L)
    // readWhere composes with vectors (pruning stays one-sided)
    assert(ManifestTable.readWhere(spark, dir, "id < 30")
      .select("id").as[Long].collect().toSeq.sorted === (20L until 30L))
  }

  test("compact applies and RETIRES deletion vectors") {
    val dir = table("retire")
    assert(ManifestTable.deleteWhereDV(spark, dir, "id >= 90", "d0"))
    // the planner scan answers a DV'd snapshot via the union plan
    // (r15: the refusal is lifted — clean files keep FileIndex pruning,
    // DV'd files anti-join; never resurrects deleted rows)
    assert(ManifestTable.scan(spark, dir).count() === 90L)
    val (in, out) = ManifestTable.compact(spark, dir)
    assert(in === 2 && out >= 1)
    assert(ManifestTable.snapshot(spark, dir).dvs.isEmpty)
    assert(ids(dir) === (0L until 90L))
    // post-compaction the planner scan works again
    assert(ManifestTable.scan(spark, dir).count() === 90L)
    // a pinned reader inside the grace window still resolves the DV'd
    // historical version exactly
    assert(ManifestTable.readVersion(spark, dir, 2L).count() === 90L)
    // vacuum sweeps only UNREFERENCED _dv dirs (a crashed op's orphan);
    // the committed sidecar stays — it is replayable history
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val committed = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_dv"))
      .map(_.getPath.getName).toSet
    val orphan = new org.apache.hadoop.fs.Path(s"$dir/_dv/orphan-dir")
    fs.mkdirs(orphan)
    ManifestTable.vacuum(spark, dir, graceMs = 0L)
    assert(!fs.exists(orphan))
    committed.foreach(n => assert(
      fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_dv/$n"))))
  }

  test("updateWhereDV rewrites O(matched rows): vector + appended files") {
    val dir = table("upd")
    val before = ManifestTable.snapshot(spark, dir)
    assert(ManifestTable.updateWhereDV(spark, dir, "id >= 95",
      Map("text" -> "concat(text, ' v2')"), "u0"))
    val after = ManifestTable.snapshot(spark, dir)
    // old files all still present (never rewritten), new file(s) appended
    assert(before.files.forall(after.files.contains))
    assert(after.files.size > before.files.size)
    assert(after.dvs.values.flatten.map(_.rows).sum === 5L)
    val got = ManifestTable.read(spark, dir).as[(Long, String)]
      .collect().toMap
    assert(got(94L) === "doc 94" && got(95L) === "doc 95 v2" &&
      got(99L) === "doc 99 v2")
    assert(got.size === 100)
    assert(!ManifestTable.updateWhereDV(spark, dir, "id >= 95",
      Map("text" -> "concat(text, ' v2')"), "u0"))
    assert(ManifestTable.metaCount(spark, dir) === Some(100L))
  }

  test("CDC over DV commits: the feed carries the same typed changes") {
    val dir = table("cdc", 50L)
    assert(ManifestTable.deleteWhereDV(spark, dir, "id < 5", "d0",
      cdc = true))                                              // v2
    assert(ManifestTable.updateWhereDV(spark, dir, "id = 10",
      Map("text" -> "'patched'"), "u0", cdc = true))            // v3
    val changes = ManifestTable.changesBetween(spark, dir, 1L, 3L)
      .select("_change_type", "id", "commit_version")
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(changes === (
      (0L until 5L).map(i => ("delete", i, 2L)) ++
        Seq(("update_postimage", 10L, 3L), ("update_preimage", 10L, 3L))
      ).sorted)
    // the streaming CDC face replays identically
    val q = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.format("memory").queryName("mdv_cdc").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("mdv_cdc")
      .where("_change_type <> 'insert'")
      .select("_change_type", "id", "commit_version")
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(streamed === changes)
  }

  test("a concurrent rewrite aborts a DV op (and vice versa) — no resurrection") {
    val dir = table("conflict")
    // a compact lands between the DV op's snapshot and its commit: the
    // DV positions were computed against files that no longer exist
    assert(!ManifestTable.deleteWhereDV(spark, dir, "id < 10", "d0",
      beforeSwap = () => { ManifestTable.compact(spark, dir); () }))
    assert(ids(dir) === (0L until 100L))
    // and a DV landing mid-compact aborts the compact (its rewrite
    // would resurrect the deleted rows)
    val dir2 = table("conflict2")
    val (i2, o2) = ManifestTable.compact(spark, dir2, beforeSwap = () => {
      assert(ManifestTable.deleteWhereDV(spark, dir2, "id = 3", "dx")); ()
    })
    assert((i2, o2) === ((0, 0)))
    assert(ids(dir2) === (0L until 100L).filterNot(_ == 3L))
  }

  test("metaCount: zero data I/O, and None when stats cannot prove the total") {
    CountingFs.install(spark)
    val dir = s"cfile:///tmp/graft_test/mdv_meta"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    ManifestTable.append(
      (0L until 60L).map(x => (x, s"doc $x")).toDF("id", "text"),
      dir, "b0")
    assert(ManifestTable.deleteWhereDV(spark, dir, "id < 15", "d0"))
    ManifestTable.snapshot(spark, dir) // resolve before counting opens
    CountingFs.reset()
    assert(ManifestTable.metaCount(spark, dir) === Some(45L))
    assert(CountingFs.opensUnder(
      new java.net.URI(dir).getPath + "/data/") === 0L,
      "metaCount touched data files")
    // a legacy table without footer stats answers None, never a guess
    val legacy = tmp("metalegacy")
    ManifestTable.append(Seq((1L, "x")).toDF("id", "text"), legacy, "b0")
    val md = new org.apache.hadoop.fs.Path(s"$legacy/_manifest")
    val lfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(legacy), spark.sparkContext.hadoopConfiguration)
    lfs.listStatus(md).filter(_.getPath.getName.matches("[vd]\\d{8,}"))
      .foreach { st =>
        val in = lfs.open(st.getPath)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toList finally in.close()
        val out = lfs.create(st.getPath, true)
        try out.write(lines.filterNot(l => l.startsWith("rows:") ||
          l.startsWith("col:")).mkString("\n").getBytes("UTF-8"))
        finally out.close()
      }
    ManifestTable.clearSnapshotCacheForTest()
    assert(ManifestTable.metaCount(spark, legacy) === None)
  }

  test("metaMinMax answers from stats, falls back on DVs, wrong types and stats gaps") {
    val dir = tmp("minmax")
    ManifestTable.append(
      (10L until 60L).map(x => (x, s"doc $x")).toDF("id", "text")
        .coalesce(1), dir, "b0")
    ManifestTable.append(
      (60L until 110L).map(x => (x, s"doc $x")).toDF("id", "text")
        .coalesce(1), dir, "b1")
    assert(ManifestTable.metaMinMax(spark, dir, "id") ===
      Some((Some(10L), Some(109L))))
    assert(ManifestTable.metaMinMax(spark, dir, "text") ===
      Some((Some("doc 10"), Some("doc 99"))))
    // unknown column / unsafe type: None, never a guess
    assert(ManifestTable.metaMinMax(spark, dir, "nope") === None)
    // a deletion vector could have removed the extremum: fall back
    assert(ManifestTable.deleteWhereDV(spark, dir, "id = 109", "d0"))
    assert(ManifestTable.metaMinMax(spark, dir, "id") === None)
    // ... but the pre-delete version still answers (pinned history)
    assert(ManifestTable.metaMinMax(spark, dir, "id", asOf = Some(2L)) ===
      Some((Some(10L), Some(109L))))
    // purging the vector rewrites the file with fresh stats: provable again
    assert(ManifestTable.purgeDeletes(spark, dir, 0.001)._1 === 1)
    assert(ManifestTable.metaMinMax(spark, dir, "id") ===
      Some((Some(10L), Some(108L))))
  }

  test("purgeDeletes rewrites ONLY delete-heavy files and retires their vectors") {
    val dir = tmp("purge")
    // four single-file appends: id bands [0,100) [100,200) [200,300) [300,400)
    (0 to 3).foreach { i =>
      ManifestTable.append(
        (i * 100L until (i + 1) * 100L).map(x => (x, s"doc $x"))
          .toDF("id", "text").coalesce(1), dir, s"b$i")
    }
    // 50% of file 0 deleted, 1% of file 1, files 2-3 untouched
    assert(ManifestTable.deleteWhereDV(spark, dir, "id < 50", "d0"))
    assert(ManifestTable.deleteWhereDV(spark, dir, "id = 150", "d1"))
    val before = ManifestTable.snapshot(spark, dir)
    assert(before.dvs.size === 2)
    val (rewritten, written) = ManifestTable.purgeDeletes(spark, dir,
      maxDeletedFraction = 0.3)
    assert(rewritten === 1 && written === 1)
    val after = ManifestTable.snapshot(spark, dir)
    // the heavy file is gone, its replacement carries no vector; the
    // 1%-deleted file keeps BOTH its bytes and its vector (under the
    // threshold, the anti-join rent is cheaper than a rewrite)
    assert(after.files.size === 4)
    assert(before.files.count(after.files.contains) === 3)
    assert(after.dvs.size === 1)
    assert(after.dvs.keys.forall(before.files.contains))
    // rows identical before/after — purge is invisible to readers
    assert(ids(dir) === ((50L until 150L) ++ (151L until 400L)))
    // the feeds skip it like any compaction (row-preserving rewrite)
    assert(ManifestTable.appendsBetween(spark, dir,
      after.version - 1L, after.version).count() === 0L)
    // metadata-only count stays exact across the purge
    assert(ManifestTable.metaCount(spark, dir) === Some(349L))
    // nothing left above the threshold: second purge is a no-op
    assert(ManifestTable.purgeDeletes(spark, dir, 0.3) === ((0, 0)))
  }

  test("purgeDeletes aborts when a new vector lands on a candidate mid-rewrite") {
    val dir = tmp("purgerace")
    ManifestTable.append(
      (0L until 100L).map(x => (x, s"doc $x")).toDF("id", "text")
        .coalesce(1), dir, "b0")
    assert(ManifestTable.deleteWhereDV(spark, dir, "id < 40", "d0"))
    val res = ManifestTable.purgeDeletes(spark, dir, 0.3,
      beforeSwap = () => {
        // a racing delete stacks a NEW vector after the purge read its
        // candidates: committing the rewrite would resurrect id 60
        assert(ManifestTable.deleteWhereDV(spark, dir, "id = 60", "dx"))
      })
    assert(res === ((0, 0)), "purge must abort on a DV conflict")
    assert(ids(dir) === ((40L until 60L) ++ (61L until 100L)))
  }

  test("DV ops on a SHALLOW CLONE bind the absolute manifest entries (ADVICE r20)") {
    val src = table("clonesrc")
    val dst = tmp("clonedst")
    ManifestTable.shallowClone(spark, src, dst)
    val snap0 = ManifestTable.snapshot(spark, dst)
    assert(snap0.files.forall(_.startsWith("/")),
      "clone entries must be absolute paths into the source data dir")
    // the regression: deleteWhereDV recorded its vector under the BARE
    // file name while readers look up the absolute entry — the op
    // reported success yet the rows stayed visible
    assert(ManifestTable.deleteWhereDV(spark, dst, "id = 42", "cd0"))
    val snap1 = ManifestTable.snapshot(spark, dst)
    assert(snap1.files === snap0.files, "a DV delete must not rewrite files")
    assert(snap1.dvs.keySet.forall(snap1.files.contains),
      s"dv keys ${snap1.dvs.keySet} must be manifest entries")
    assert(ids(dst) === (0L until 100L).filterNot(_ == 42L),
      "the cloned table must actually lose the DV'd row")
    // the source is untouched
    assert(ids(src) === (0L until 100L))
    // updateWhereDV through the same seam
    assert(ManifestTable.updateWhereDV(spark, dst, "id = 7",
      Map("text" -> "'patched'"), "cu0"))
    assert(ManifestTable.read(spark, dst).where("id = 7")
      .select("text").as[String].collect().toSeq === Seq("patched"))
    assert(ManifestTable.read(spark, src).where("id = 7")
      .select("text").as[String].collect().toSeq === Seq("doc 7"))
  }
}
