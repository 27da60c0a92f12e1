package graft

import graft.ext.ManifestTable

/** RESTORE + timestamp time travel: a restore is one metadata commit
  * that makes a historical version's state the head without erasing the
  * intervening history; `versionAt` maps a wall-clock instant to the
  * newest commit at or before it. The cold-replay case is the hard one:
  * a restore past a DV commit must reconstruct identically from the
  * delta log (the `cleardv:` action), not just in the writing driver's
  * cache.
  */
class ManifestRestoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/graft_test/mrestore_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  private def batch(ids: Long*) =
    ids.map(i => (i, s"doc $i")).toDF("id", "text").coalesce(1)

  private def ids(dir: String): Seq[Long] =
    ManifestTable.read(spark, dir).select("id").as[Long]
      .collect().toSeq.sorted

  test("restore rewinds data, keeps history, absorbs replays — warm and COLD") {
    val dir = tmp("basic")
    ManifestTable.append(batch(1, 2), dir, "b0")                 // v1
    ManifestTable.append(batch(3, 4), dir, "b1")                 // v2
    assert(ManifestTable.deleteWhere(spark, dir, "id = 2", "d0")) // v3
    assert(ids(dir) === Seq(1L, 3L, 4L))
    assert(ManifestTable.restore(spark, dir, 2L, "r0"))          // v4
    assert(ids(dir) === Seq(1L, 2L, 3L, 4L))
    val s4 = ManifestTable.snapshot(spark, dir)
    assert(s4.version === 4L && s4.op === "restore")
    // history intact: v3 still shows the deleted state
    assert(ManifestTable.readVersion(spark, dir, 3L).count() === 3L)
    // replays stay absorbed: the restore op, and a pre-restore append
    assert(!ManifestTable.restore(spark, dir, 2L, "r0"))
    assert(!ManifestTable.append(batch(3, 4), dir, "b1"))
    // a COLD driver replays the restore delta to the same state
    ManifestTable.clearSnapshotCacheForTest()
    assert(ids(dir) === Seq(1L, 2L, 3L, 4L))
    // and a second restore undoes the first (v3's state back)
    assert(ManifestTable.restore(spark, dir, 3L, "r1"))          // v5
    assert(ids(dir) === Seq(1L, 3L, 4L))
  }

  test("restore past a DV commit cold-replays exactly (cleardv in the delta)") {
    val dir = tmp("dv")
    ManifestTable.append(batch(1L to 20L: _*), dir, "b0")        // v1
    assert(ManifestTable.deleteWhereDV(spark, dir, "id <= 5", "d0")) // v2
    assert(ids(dir) === (6L to 20L))
    val preRestoreDvs = ManifestTable.snapshot(spark, dir).dvs
    assert(preRestoreDvs.nonEmpty)
    assert(ManifestTable.restore(spark, dir, 1L, "r0"))          // v3
    assert(ManifestTable.snapshot(spark, dir).dvs.isEmpty)
    assert(ids(dir) === (1L to 20L))
    // THE replay hazard: without cleardv a cold driver would fold v2's
    // vector into v3's state and resurrect the delete
    ManifestTable.clearSnapshotCacheForTest()
    assert(ManifestTable.snapshot(spark, dir).dvs.isEmpty,
      "cold replay resurrected the deletion vector the restore cleared")
    assert(ids(dir) === (1L to 20L))
    // the DV'd version itself still time-travels exactly
    ManifestTable.clearSnapshotCacheForTest()
    assert(ManifestTable.readVersion(spark, dir, 2L)
      .select("id").as[Long].collect().toSeq.sorted === (6L to 20L))
  }

  test("restore refuses when a needed file was vacuumed away") {
    val dir = tmp("vacuumed")
    ManifestTable.append(batch(1, 2), dir, "b0")                 // v1
    ManifestTable.compact(spark, dir)                            // v2
    // grace 0 sweeps v1's original file — v1 is no longer restorable.
    // (sleep past the clock tick: a commit mtime equal to vacuum's
    // cutoff millisecond counts as in-grace and conservatively sweeps
    // nothing — observed as a flake on an idle box)
    Thread.sleep(10)
    assert(ManifestTable.vacuum(spark, dir, graceMs = 0L) >= 1)
    val e = intercept[IllegalArgumentException] {
      ManifestTable.restore(spark, dir, 1L, "r0")
    }
    assert(e.getMessage.contains("vacuumed"))
    assert(ids(dir) === Seq(1L, 2L)) // nothing committed
  }

  test("versionAt / readTimestamp: newest commit at-or-before the instant") {
    val dir = tmp("ts")
    ManifestTable.append(batch(1), dir, "b0")                    // v1
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    ManifestTable.append(batch(2), dir, "b1")                    // v2
    assert(ManifestTable.versionAt(spark, dir, between) === 1L)
    assert(ManifestTable.versionAt(spark, dir,
      System.currentTimeMillis()) === 2L)
    assert(ManifestTable.readTimestamp(spark, dir, between)
      .count() === 1L)
    // an instant before the table existed raises, never mis-resolves
    val e = intercept[IllegalArgumentException] {
      ManifestTable.versionAt(spark, dir, 1000L)
    }
    assert(e.getMessage.contains("no commit at or before"))
  }

  test("restore to an expired version raises cleanly") {
    val dir = tmp("expired")
    ManifestTable.append(batch(1L, 2L, 3L), dir, "b0") // v1
    (2 to 26).foreach { v =>
      if (v % 2 == 0)
        ManifestTable.addConstraint(spark, dir, s"c$v", "id IS NOT NULL")
      else ManifestTable.dropConstraint(spark, dir, s"c${v - 1}")
    }
    assert(ManifestTable.expireLog(spark, dir, retainVersions = 5L) > 0)
    val e = intercept[IllegalArgumentException] {
      ManifestTable.restore(spark, dir, 2L, "r0")
    }
    assert(e.getMessage.contains("no manifest version"))
    // retained versions still restore
    assert(ManifestTable.restore(spark, dir,
      ManifestTable.headVersion(spark, dir) - 1L, "r1"))
  }

  test("detail(): the one-row metadata summary, zero data I/O") {
    val dir = tmp("detail")
    val d = (0L until 60L)
      .map(i => (i, Seq("sf", "nyc")((i % 2).toInt), s"doc $i"))
      .toDF("id", "city", "text")
    ManifestTable.append(d, dir, "b0", partitionBy = Seq("city"))
    ManifestTable.addConstraint(spark, dir, "idnn", "id IS NOT NULL")
    assert(ManifestTable.deleteWhereDV(spark, dir, "id = 3", "dv0"))
    val row = ManifestTable.detail(spark, dir).collect()(0)
    assert(row.getAs[Long]("version") === 3L)
    assert(row.getAs[Long]("n_files") > 0L)
    assert(row.getAs[Long]("size_bytes") > 0L)
    assert(row.getAs[java.lang.Long]("rows_known") === 59L)
    assert(row.getAs[String]("partition_cols") === "city")
    assert(row.getAs[Long]("n_dv_files") === 1L)
    assert(row.getAs[Long]("n_constraints") === 1L)
    assert(row.getAs[Long]("n_batches") === 2L) // b0 + dv0
    assert(row.getAs[Boolean]("has_schema"))
  }

  private def changes(dir: String, from: Long, to: Long)
  : Seq[(Long, String, Long)] =
    ManifestTable.changesBetween(spark, dir, from, to)
      .select("id", "_change_type", "commit_version")
      .as[(Long, String, Long)].collect().toSeq.sortBy(r => (r._3, r._2, r._1))

  test("a DV-ONLY restore (cleardv, no removes): append feed raises, CDC spans it") {
    // The r14-verified silent-skip shape: the restore's delta carries
    // ONLY cleardv: lines — files unchanged, no new dv refs — yet it
    // resurrects rows. The append feed cannot represent that (raise);
    // the change feed synthesizes the diff: the un-deleted positions
    // come back as inserts.
    val dir = tmp("dvonly_feed")
    ManifestTable.append(batch(1L to 20L: _*), dir, "b0")            // v1
    assert(ManifestTable.deleteWhereDV(spark, dir, "id <= 5", "d0")) // v2
    assert(ManifestTable.restore(spark, dir, 1L, "r0"))              // v3
    assert(ManifestTable.snapshot(spark, dir).dvs.isEmpty)
    val e = intercept[IllegalStateException] {
      ManifestTable.appendsBetween(spark, dir, 2L, 3L).count()
    }
    assert(e.getMessage.contains("restore"),
      s"DV-only restore must raise in the append feed, got: ${e.getMessage}")
    assert(changes(dir, 2L, 3L) ===
      (1L to 5L).map(i => (i, "insert", 3L)))
  }

  test("the append feed refuses a restore; the CHANGE feed spans it as a diff") {
    val dir = tmp("feeds")
    ManifestTable.append(batch(1, 2), dir, "b0")                 // v1
    ManifestTable.append(batch(3), dir, "b1")                    // v2
    assert(ManifestTable.restore(spark, dir, 1L, "r0"))          // v3
    val e = intercept[IllegalStateException] {
      ManifestTable.appendsBetween(spark, dir, 0L, 3L).count()
    }
    assert(e.getMessage.contains("restore"))
    // the full feed: v1/v2 inserts, then the rewind deletes v2's rows
    assert(changes(dir, 0L, 3L) === Seq(
      (1L, "insert", 1L), (2L, "insert", 1L),
      (3L, "insert", 2L), (3L, "delete", 3L)))
    // a consumer applying the feed in order reconstructs the head
    assert(changes(dir, 2L, 3L) === Seq((3L, "delete", 3L)))
  }

  test("restore CDC spans CoW deletes, file resurrection and re-deletion") {
    val dir = tmp("cdc_cow")
    ManifestTable.append(batch(1L to 10L: _*), dir, "b0")            // v1
    assert(ManifestTable.deleteWhere(spark, dir, "id <= 3", "d0"))   // v2
    assert(ManifestTable.restore(spark, dir, 1L, "r0"))              // v3
    // the rewind drops v2's rewrite (delete 4..10 at v3's diff? no:
    // v2 rewrote the file to ids 4..10; restore swaps back to the
    // original file — rows 4..10 leave AND come back, 1..3 come back)
    val d3 = changes(dir, 2L, 3L)
    val inserts = d3.filter(_._2 == "insert").map(_._1)
    val deletes = d3.filter(_._2 == "delete").map(_._1)
    assert(inserts === (1L to 10L),
      s"restore must surface the resurrected file's rows, got $inserts")
    assert(deletes === (4L to 10L),
      s"restore must surface the dropped rewrite's rows, got $deletes")
    // net effect applied in order = the restored table
    assert(ids(dir) === (1L to 10L))
    // restoring INTO the more-deleted version: the original file's rows
    // leave (1..10 delete), the rewrite's rows return (4..10 insert) —
    // net effect applied in order = 4..10, the restored state
    assert(ManifestTable.restore(spark, dir, 2L, "r1"))              // v4
    val d4 = changes(dir, 3L, 4L)
    assert(d4.filter(_._2 == "delete").map(_._1) === (1L to 10L))
    assert(d4.filter(_._2 == "insert").map(_._1) === (4L to 10L))
    assert(ids(dir) === (4L to 10L))
  }

  test("the CDC STREAM replays a restore diff exactly once") {
    import scala.jdk.CollectionConverters._
    val dir = tmp("cdc_stream")
    ManifestTable.append(batch(1L to 8L: _*), dir, "b0")             // v1
    assert(ManifestTable.deleteWhereDV(spark, dir, "id >= 7", "d0",
      cdc = true))                                                   // v2
    assert(ManifestTable.restore(spark, dir, 1L, "r0"))              // v3
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]
    val q = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id", "_change_type", "commit_version")
          .collect().foreach(r =>
            out.add((r.getLong(0), r.getString(1), r.getLong(2))))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val got = out.iterator().asScala.toSeq.sortBy(r => (r._3, r._2, r._1))
    val expected =
      (1L to 8L).map(i => (i, "insert", 1L)) ++   // v1 appends
        Seq((7L, "delete", 2L), (8L, "delete", 2L)) ++ // v2 DV delete (CDC)
        Seq((7L, "insert", 3L), (8L, "insert", 3L))    // v3 restore diff
    assert(got === expected.sortBy(r => (r._3, r._2, r._1)))
  }
}
