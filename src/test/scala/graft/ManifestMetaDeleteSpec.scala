package graft

import org.apache.spark.sql.functions._
import graft.ext.{ManifestTable, Skipping}

/** METADATA-ONLY DELETE: a candidate file whose stats PROVE every row
  * matches the predicate (Skipping.provesAll — the dual of skips) is
  * dropped from the manifest without being read or rewritten; a DV
  * delete drops it instead of writing a vector naming every position.
  * The proof is refuted-negation over the file interval plus a
  * null-free requirement (a NULL-valued predicate row is KEPT by SQL
  * DELETE, so it must never be dropped wholesale). At 100 TB this makes
  * `DELETE WHERE lang = 'de'` on a lang-partitioned table a pure
  * manifest commit: zero data I/O.
  */
class ManifestMetaDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/graft_test/mmeta_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  private def pe(sql: String) =
    spark.sessionState.sqlParser.parseExpression(sql)

  private def fstats(rows: Long, cols: (String, ManifestTable.ColStats)*) =
    ManifestTable.FileStats(rows, cols.toMap)

  private def cs(typ: String, mn: String, mx: String, nulls: Long = 0L) =
    ManifestTable.ColStats(typ, Some(mn), Some(mx), nulls)

  test("provesAll: interval proofs, null guard, unknown shapes") {
    val st = fstats(10L, "id" -> cs("long", "10", "19"),
      "lang" -> cs("string", "de", "de"))
    // full-interval coverage proves; partial does not
    assert(Skipping.provesAll(pe("id >= 10 AND id < 20"), st))
    assert(!Skipping.provesAll(pe("id >= 11 AND id < 20"), st))
    assert(Skipping.provesAll(pe("id <= 19"), st))
    assert(!Skipping.provesAll(pe("id < 19"), st))
    // point stats prove equality and IN-membership
    assert(Skipping.provesAll(pe("lang = 'de'"), st))
    assert(Skipping.provesAll(pe("lang IN ('de', 'fr')"), st))
    assert(!Skipping.provesAll(pe("id = 10"), st))
    // literal outside the interval proves <>
    assert(Skipping.provesAll(pe("id <> 25"), st))
    assert(!Skipping.provesAll(pe("id <> 15"), st))
    // OR proves through either side; AND needs both
    assert(Skipping.provesAll(pe("id < 100 OR lang = 'xx'"), st))
    assert(Skipping.provesAll(pe("lang = 'de' AND id >= 10"), st))
    assert(!Skipping.provesAll(pe("lang = 'de' AND id > 10"), st))
    // a single null in the referenced column kills every proof: that
    // row's predicate is NULL, and SQL DELETE keeps it
    val stN = fstats(10L, "id" -> cs("long", "10", "19", nulls = 1L))
    assert(!Skipping.provesAll(pe("id >= 10 AND id < 20"), stN))
    assert(Skipping.provesAll(pe("id IS NOT NULL"), st))
    assert(!Skipping.provesAll(pe("id IS NOT NULL"), stN))
    // all-null column proves IS NULL
    val stAllN = fstats(5L,
      "id" -> ManifestTable.ColStats("long", None, None, 5L))
    assert(Skipping.provesAll(pe("id IS NULL"), stAllN))
    // unknown shapes, unknown columns, non-literal sides: never proven
    assert(!Skipping.provesAll(pe("id % 2 = 0"), st))
    assert(!Skipping.provesAll(pe("nope = 1"), st))
    assert(!Skipping.provesAll(pe("id = id"), st))
    assert(Skipping.provesAll(pe("true"), st))
    assert(!Skipping.provesAll(pe("false"), st))
  }

  test("CoW delete: an aligned band drops whole files with zero adds") {
    val dir = tmp("band")
    ManifestTable.append(
      (0L until 600L).map(i => (i, (i to i + 30L).mkString(" ")))
        .toDF("id", "text"),
      dir, "b0")
    // 2 KB target: the optimized write lands the append as one packed
    // file, so the ≥5-banded-files layout must be asked for in bytes
    ManifestTable.compact(spark, dir,
      targetFileBytes = 2L * 1024, clusterBy = Seq("id"))
    val s0 = ManifestTable.snapshot(spark, dir)
    assert(s0.files.size >= 5, s"fixture too coarse: ${s0.files.size} files")
    val ranges = s0.files.map { f =>
      val c = s0.stats(f).cols("id")
      (f, c.min.get.toLong, c.max.get.toLong)
    }.sortBy(_._2)
    val inner = ranges.slice(1, 3)
    val (lo, hi) = (inner.head._2, inner.last._3)
    // the band exactly covers two interior files: both drop, nothing
    // is rewritten (zero adds), neighbours untouched
    assert(ManifestTable.deleteWhere(spark, dir,
      s"id >= $lo AND id <= $hi", "d0"))
    val s1 = ManifestTable.snapshot(spark, dir)
    inner.foreach { case (f, _, _) => assert(!s1.files.contains(f)) }
    assert(s1.files.forall(s0.files.contains),
      "aligned band delete rewrote a file it should have dropped")
    assert(s1.files.size === s0.files.size - 2)
    assert(ManifestTable.read(spark, dir).select("id").as[Long]
      .collect().toSeq.sorted ===
      (0L until 600L).filterNot(i => i >= lo && i <= hi))
    // a MISALIGNED band still rewrites its edge: extend one row past a
    // surviving file's min
    val ranges1 = s1.files.map { f =>
      val c = s1.stats(f).cols("id")
      (f, c.min.get.toLong, c.max.get.toLong)
    }.sortBy(_._2)
    val edge = ranges1.last
    assert(ManifestTable.deleteWhere(spark, dir, s"id = ${edge._2}", "d1"))
    val s2 = ManifestTable.snapshot(spark, dir)
    assert(!s2.files.contains(edge._1), "edge file not rewritten")
    assert(s2.files.exists(f => !s1.files.contains(f)),
      "a partial delete must add the rewritten survivor file")
  }

  test("partitioned table: DELETE on the partition column is pure metadata") {
    val dir = tmp("part")
    val rows = (0L until 300L)
      .map(i => (i, Seq("sf", "nyc", "ber")((i % 3).toInt), s"doc $i"))
      .toDF("id", "city", "text")
    ManifestTable.append(rows, dir, "b0", partitionBy = Seq("city"))
    val s0 = ManifestTable.snapshot(spark, dir)
    val sfFiles = s0.files.filter(f =>
      s0.pvals(f)("city").value.contains("sf"))
    assert(sfFiles.nonEmpty && sfFiles.size < s0.files.size)
    assert(ManifestTable.deleteWhere(spark, dir, "city = 'sf'", "d0"))
    val s1 = ManifestTable.snapshot(spark, dir)
    // every sf file dropped, every other file untouched, zero adds —
    // the whole op was one manifest commit
    assert(s1.files.toSet === s0.files.toSet -- sfFiles)
    assert(ManifestTable.read(spark, dir).select("city").distinct()
      .as[String].collect().toSet === Set("nyc", "ber"))
    assert(ManifestTable.metaCount(spark, dir) === Some(200L))
  }

  test("a partition delete opens ZERO data files (FS-seam proof) and commits O(region)") {
    CountingFs.install(spark)
    val dir = "cfile:///tmp/graft_test/mmeta_zeroio"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val rows = (0L until 300L)
      .map(i => (i, Seq("sf", "nyc", "ber")((i % 3).toInt), s"doc $i"))
      .toDF("id", "city", "text")
    ManifestTable.append(rows, dir, "b0", partitionBy = Seq("city"))
    val s0 = ManifestTable.snapshot(spark, dir)
    val sfFiles = s0.files.filter(f =>
      s0.pvals(f)("city").value.contains("sf")).toSet
    ManifestTable.snapshot(spark, dir) // resolve before counting opens
    CountingFs.reset()
    assert(ManifestTable.deleteWhere(spark, dir, "city = 'sf'", "d0"))
    assert(CountingFs.opensUnder(
      new java.net.URI(dir).getPath + "/data/") === 0L,
      "a whole-partition delete read data files")
    // and the commit's DELTA names only the region: one remove per sf
    // file, no adds, no full file list — O(dropped files) log bytes on
    // any table size
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$dir/_manifest/d00000002"))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    assert(lines.count(_.startsWith("remove:")) === sfFiles.size)
    assert(!lines.exists(l => l.startsWith("add:") || l.startsWith("file:")))
  }

  test("rows with NULL in the predicate column survive (no wholesale drop)") {
    val dir = tmp("nulls")
    val rows = (0L until 40L)
      .map(i => (i, if (i % 2 == 0) null else "x"))
      .toDF("id", "city").coalesce(1)
    ManifestTable.append(rows, dir, "b0")
    assert(ManifestTable.deleteWhere(spark, dir, "city = 'x'", "d0"))
    // the file held nulls, so it was REWRITTEN, not dropped: the NULL
    // rows (predicate NULL -> kept, SQL semantics) all survive
    assert(ManifestTable.read(spark, dir).select("id").as[Long]
      .collect().toSeq.sorted === (0L until 40L).filter(_ % 2 == 0))
  }

  test("DV delete drops covered files instead of writing vectors") {
    val dir = tmp("dv")
    ManifestTable.append(
      (0L until 600L).map(i => (i, (i to i + 30L).mkString(" ")))
        .toDF("id", "text"),
      dir, "b0")
    ManifestTable.compact(spark, dir,
      targetFileBytes = 4L * 1024, clusterBy = Seq("id"))
    val s0 = ManifestTable.snapshot(spark, dir)
    val ranges = s0.files.map { f =>
      val c = s0.stats(f).cols("id")
      (f, c.min.get.toLong, c.max.get.toLong)
    }.sortBy(_._2)
    val whole = ranges(1)
    // a band = exactly one file: dropped outright, NO deletion vector
    assert(ManifestTable.deleteWhereDV(spark, dir,
      s"id >= ${whole._2} AND id <= ${whole._3}", "d0"))
    val s1 = ManifestTable.snapshot(spark, dir)
    assert(!s1.files.contains(whole._1))
    assert(s1.files.forall(s0.files.contains) &&
      s1.files.size === s0.files.size - 1)
    assert(s1.dvs.isEmpty, "whole-file DV delete should write no vector")
    // a mid-file point still takes the vector path, file retained
    val mid = ranges(3)
    val target = (mid._2 + mid._3) / 2
    assert(ManifestTable.deleteWhereDV(spark, dir, s"id = $target", "d1"))
    val s2 = ManifestTable.snapshot(spark, dir)
    assert(s2.files.contains(mid._1))
    assert(s2.dvs.get(mid._1).exists(_.map(_.rows).sum == 1L))
    assert(ManifestTable.read(spark, dir).count() ===
      600L - (whole._3 - whole._2 + 1L) - 1L)
  }

  test("CDC still records every dropped row; feeds stay consistent") {
    val dir = tmp("cdc")
    val rows = (0L until 300L)
      .map(i => (i, Seq("sf", "nyc", "ber")((i % 3).toInt), s"doc $i"))
      .toDF("id", "city", "text")
    ManifestTable.append(rows, dir, "b0", partitionBy = Seq("city")) // v1
    assert(ManifestTable.deleteWhere(spark, dir, "city = 'sf'", "d0",
      cdc = true))                                                  // v2
    val s1 = ManifestTable.snapshot(spark, dir)
    assert(s1.cdcPath.isDefined, "metadata delete with cdc lost its sidecar")
    val changes = ManifestTable.changesBetween(spark, dir, 1L, 2L)
    assert(changes.where("_change_type = 'delete'").select("id").as[Long]
      .collect().toSeq.sorted === (0L until 300L).filter(_ % 3 == 0))
  }
}
