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
    // grace 0 sweeps v1's original file — v1 is no longer restorable
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

  test("the feeds refuse a DV-ONLY restore (cleardv with no removes)") {
    // The silent-skip shape: the restore's delta carries ONLY cleardv:
    // lines — files unchanged, no new dv refs — yet it resurrects rows.
    // A feed that classified it pureInsert would skip the commit and
    // never surface the resurrected rows to consumers.
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
    val e2 = intercept[IllegalStateException] {
      ManifestTable.changesBetween(spark, dir, 2L, 3L).count()
    }
    assert(e2.getMessage.contains("restore"))
  }

  test("the feeds refuse a restore commit instead of mis-reporting it") {
    val dir = tmp("feeds")
    ManifestTable.append(batch(1, 2), dir, "b0")                 // v1
    ManifestTable.append(batch(3), dir, "b1")                    // v2
    assert(ManifestTable.restore(spark, dir, 1L, "r0"))          // v3
    val e = intercept[IllegalStateException] {
      ManifestTable.appendsBetween(spark, dir, 0L, 3L).count()
    }
    assert(e.getMessage.contains("restore"))
    val e2 = intercept[IllegalStateException] {
      ManifestTable.changesBetween(spark, dir, 0L, 3L).count()
    }
    assert(e2.getMessage.contains("restore"))
  }
}
