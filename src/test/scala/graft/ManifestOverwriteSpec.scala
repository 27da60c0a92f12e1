package graft

import org.apache.spark.sql.functions._
import graft.ext.ManifestTable

/** INSERT OVERWRITE ... WHERE (replaceWhere): one atomic commit swaps
  * the predicate's region for the incoming frame — incoming rows must
  * satisfy the predicate, covered files drop by metadata, straddling
  * files rewrite without their matching rows, and the feeds/CDC see a
  * delete+insert. The partition-backfill idiom for 100 TB tables.
  */
class ManifestOverwriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/graft_test/movr_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  private def city(i: Long) = Seq("sf", "nyc", "ber")((i % 3).toInt)

  private def rows(ids: Range, tag: String = "doc") =
    ids.map(i => (i.toLong, city(i.toLong), s"$tag $i"))
      .toDF("id", "city", "text")

  test("a partition overwrite drops the old files, writes only the new") {
    val dir = tmp("part")
    ManifestTable.append(rows(0 until 300), dir, "b0",
      partitionBy = Seq("city"))
    val s0 = ManifestTable.snapshot(spark, dir)
    val sfFiles = s0.files.filter(f =>
      s0.pvals(f)("city").value.contains("sf")).toSet
    assert(sfFiles.nonEmpty)
    // the backfill: re-derive the sf partition from fresh data
    val fresh = rows(0 until 300, "v2").filter(col("city") === "sf")
    assert(ManifestTable.overwriteWhere(fresh, dir, "city = 'sf'", "o0"))
    val s1 = ManifestTable.snapshot(spark, dir)
    // old sf files dropped (metadata — their partition tuple proves full
    // coverage), non-sf files untouched, new files all carry city=sf
    assert((s0.files.toSet -- sfFiles).subsetOf(s1.files.toSet))
    sfFiles.foreach(f => assert(!s1.files.contains(f)))
    val newFiles = s1.files.toSet -- s0.files.toSet
    assert(newFiles.nonEmpty)
    newFiles.foreach(f =>
      assert(s1.pvals(f)("city").value.contains("sf"),
        "overwrite lost the partition layout"))
    val got = ManifestTable.read(spark, dir)
      .select("id", "text").as[(Long, String)].collect().toMap
    (0L until 300L).foreach { i =>
      assert(got(i) === (if (city(i) == "sf") s"v2 $i" else s"doc $i"))
    }
    // replay: absorbed
    assert(!ManifestTable.overwriteWhere(fresh, dir, "city = 'sf'", "o0"))
  }

  test("incoming rows OUTSIDE the region are rejected before anything lands") {
    val dir = tmp("reject")
    ManifestTable.append(rows(0 until 30), dir, "b0")
    val v0 = ManifestTable.snapshot(spark, dir).version
    val e = intercept[IllegalArgumentException] {
      ManifestTable.overwriteWhere(rows(0 until 30), dir,
        "city = 'sf'", "o0")
    }
    assert(e.getMessage.contains("do not satisfy"))
    assert(ManifestTable.snapshot(spark, dir).version === v0)
    // and a mismatched column set is a loud error, not a schema change
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.overwriteWhere(
        Seq((1L, "sf")).toDF("id", "city"), dir, "city = 'sf'", "o1")
    }
    assert(e2.getMessage.contains("not a schema change"))
  }

  test("a band overwrite rewrites only straddling files; region swaps atomically") {
    val dir = tmp("band")
    ManifestTable.append(
      (0L until 600L).map(i => (i, (i to i + 30L).mkString(" ")))
        .toDF("id", "text"), dir, "b0")
    // 2 KB target: the optimized write lands the append as one packed
    // file, so the many-banded-files layout must be asked for in bytes
    ManifestTable.compact(spark, dir,
      targetFileBytes = 2L * 1024, clusterBy = Seq("id"))
    val s0 = ManifestTable.snapshot(spark, dir)
    val replacement = (200L until 400L by 2L)
      .map(i => (i, s"new $i")).toDF("id", "text")
    assert(ManifestTable.overwriteWhere(replacement, dir,
      "id >= 200 AND id < 400", "o0"))
    val got = ManifestTable.read(spark, dir).select("id", "text")
      .as[(Long, String)].collect().toMap
    assert(got.size === 400 + 100)
    (0L until 200L).foreach(i => assert(got(i).startsWith(s"$i ")))
    (400L until 600L).foreach(i => assert(got(i).startsWith(s"$i ")))
    (200L until 400L).foreach { i =>
      if (i % 2 == 0L) assert(got(i) === s"new $i")
      else assert(!got.contains(i), s"row $i should have been replaced away")
    }
    // files the stats prove fully inside the band were dropped, not
    // rewritten; files fully outside were never candidates
    val s1 = ManifestTable.snapshot(spark, dir)
    val fullyCovered = s0.files.filter(f =>
      s0.stats(f).cols("id").min.get.toLong >= 200L &&
        s0.stats(f).cols("id").max.get.toLong < 400L)
    assert(fullyCovered.nonEmpty)
    fullyCovered.foreach(f => assert(!s1.files.contains(f)))
    val outside = s0.files.filter(f =>
      s0.stats(f).cols("id").max.get.toLong < 200L ||
        s0.stats(f).cols("id").min.get.toLong >= 400L)
    outside.foreach(f => assert(s1.files.contains(f),
      "a file outside the region was touched"))
  }

  test("CDC records the swap as deletes + inserts; feeds classify by content") {
    val dir = tmp("cdc")
    ManifestTable.append(rows(0 until 90), dir, "b0",
      partitionBy = Seq("city"))                                    // v1
    val fresh = (0L until 10L).map(i =>
      (i + 1000L, "sf", s"new $i")).toDF("id", "city", "text")
    assert(ManifestTable.overwriteWhere(fresh, dir, "city = 'sf'", "o0",
      cdc = true))                                                  // v2
    val ch = ManifestTable.changesBetween(spark, dir, 1L, 2L)
    assert(ch.where("_change_type = 'delete'").select("id").as[Long]
      .collect().toSeq.sorted === (0L until 90L).filter(_ % 3 == 0))
    assert(ch.where("_change_type = 'insert'").select("id").as[Long]
      .collect().toSeq.sorted === (1000L until 1010L))
    // the append feed refuses the commit — it changed visible rows
    val e = intercept[IllegalStateException] {
      ManifestTable.appendsBetween(spark, dir, 1L, 2L).count()
    }
    assert(e.getMessage.contains("append"))
    // an overwrite of an EMPTY region is a pure insert: the append feed
    // surfaces it by delta content, no sidecar needed
    val more = (0L until 5L).map(i =>
      (i + 2000L, "rom", s"r $i")).toDF("id", "city", "text")
    assert(ManifestTable.overwriteWhere(more, dir, "city = 'rom'", "o1")) // v3
    assert(ManifestTable.appendsBetween(spark, dir, 2L, 3L)
      .select("id").as[Long].collect().toSeq.sorted ===
      (2000L until 2005L))
  }

  test("creating overwrite on an empty table behaves like an append") {
    val dir = tmp("create")
    assert(ManifestTable.overwriteWhere(rows(0 until 30), dir,
      "id >= 0", "o0"))
    assert(ManifestTable.read(spark, dir).count() === 30L)
    assert(ManifestTable.snapshot(spark, dir).op === "overwrite")
  }
}
