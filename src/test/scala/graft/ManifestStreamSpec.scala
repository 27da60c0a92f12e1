package graft

import org.apache.spark.sql.functions._
import graft.ext.ManifestTable

/** The manifest table as a streaming source ([[graft.ext.ManifestStreamSource]]):
  * offsets are manifest versions, batches are the append feed —
  * appended rows arrive exactly once, compactions are invisible,
  * row-level commits fail the stream, `sinceVersion` skips history.
  */
class ManifestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/graft_test/manifeststream_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  private def batch(ids: Long*): org.apache.spark.sql.DataFrame =
    ids.map(i => (i, s"doc $i")).toDF("id", "text")

  test("appended rows arrive exactly once; compactions contribute nothing") {
    val dir = tmp("feed")
    ManifestTable.append(batch(1, 2), dir, "b0")
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("memory").queryName("mt_feed")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("mt_feed").select("id").as[Long]
        .collect().toSeq.sorted === Seq(1L, 2L))
      // new append while the stream runs: only the delta arrives
      ManifestTable.append(batch(3), dir, "b1")
      q.processAllAvailable()
      assert(spark.table("mt_feed").select("id").as[Long]
        .collect().toSeq.sorted === Seq(1L, 2L, 3L))
      // a compaction rewrites EVERY row into new files; the feed must
      // not re-emit them (op provenance, not file-list diffing)
      ManifestTable.compact(spark, dir,
        targetFileBytes = 1024L * 1024 * 1024)
      ManifestTable.append(batch(4), dir, "b2")
      q.processAllAvailable()
      assert(spark.table("mt_feed").select("id").as[Long]
        .collect().toSeq.sorted === Seq(1L, 2L, 3L, 4L))
    } finally { q.stop(); spark.catalog.dropTempView("mt_feed") }
  }

  test("a filtered stream prunes files within each batch") {
    val dir = tmp("prune")
    (0 until 4).foreach { i =>
      ManifestTable.append(
        (0L until 400L).filter(_ % 4 == i).map(x => (x, s"doc $x"))
          .toDF("id", "text").coalesce(1), dir, s"b$i",
        bloomCols = Seq("id"))
    }
    // the stream's .where lands in the batch relation's dataFilters and
    // runs through the same bloom/stats pruning as a batch scan
    val q = spark.readStream.format("graft-manifest").load(dir)
      .where(col("id") === 217)
      .writeStream.format("memory").queryName("mt_prune")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("mt_prune").select("text").as[String]
        .collect().toSeq === Seq("doc 217"))
    } finally { q.stop(); spark.catalog.dropTempView("mt_prune") }
  }

  test("sinceVersion starts the feed after the named version, exclusively") {
    val dir = tmp("since")
    ManifestTable.append(batch(1), dir, "b0") // v1
    ManifestTable.append(batch(2), dir, "b1") // v2
    ManifestTable.append(batch(3), dir, "b2") // v3
    val q = spark.readStream.format("graft-manifest")
      .option("sinceVersion", "1").load(dir)
      .writeStream.format("memory").queryName("mt_since")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("mt_since").select("id").as[Long]
        .collect().toSeq.sorted === Seq(2L, 3L))
    } finally { q.stop(); spark.catalog.dropTempView("mt_since") }
  }

  test("sinceTimestamp starts the feed after the instant's newest commit") {
    val dir = tmp("sincets")
    ManifestTable.append(batch(1, 2), dir, "b0") // v1
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    ManifestTable.append(batch(3), dir, "b1")    // v2
    val sink = "mt_sincets"
    val q = spark.readStream.format("graft-manifest")
      .option("sinceTimestamp", between.toString).load(dir)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // only v2's rows: v1 predates the instant
      assert(spark.table(sink).select("id").as[Long]
        .collect().toSeq.sorted === Seq(3L))
    } finally { q.stop(); spark.catalog.dropTempView(sink) }
    // the two pins are mutually exclusive; the error surfaces on the
    // stream thread (createSource runs there), so await it
    val q2 = spark.readStream.format("graft-manifest")
      .option("sinceVersion", "1").option("sinceTimestamp", "1")
      .load(dir)
      .writeStream.format("memory").queryName("mt_sincets_bad")
      .outputMode("append").start()
    val e = intercept[Exception] {
      try { q2.processAllAvailable(); q2.awaitTermination(10000) }
      finally q2.stop()
    }
    assert(e.getMessage.contains("mutually exclusive") ||
      Option(e.getCause).exists(_.getMessage.contains("mutually exclusive")))
  }

  test("maxVersionsPerTrigger bounds each micro-batch; nothing is lost") {
    val dir = tmp("ratelimit")
    (0 until 4).foreach(i =>
      ManifestTable.append(batch(i.toLong), dir, s"b$i")) // v1..v4
    val q = spark.readStream.format("graft-manifest")
      .option("maxVersionsPerTrigger", "1").load(dir)
      .writeStream.format("memory").queryName("mt_rate")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // all rows arrive — the cap slices the backfill, it never drops it
      assert(spark.table("mt_rate").select("id").as[Long]
        .collect().toSeq.sorted === Seq(0L, 1L, 2L, 3L))
      // and they arrived across MULTIPLE one-version batches, not one
      // history-sized gulp
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4)
    } finally { q.stop(); spark.catalog.dropTempView("mt_rate") }
  }

  test("Trigger.AvailableNow drains the backlog in capped windows, then STOPS") {
    val dir = tmp("availnow")
    (0 until 5).foreach(i =>
      ManifestTable.append(batch(i.toLong), dir, s"b$i")) // v1..v5
    val q = spark.readStream.format("graft-manifest")
      .option("maxVersionsPerTrigger", "2").load(dir)
      .writeStream.format("memory").queryName("mt_availnow")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      // the bounded-backfill contract: the query terminates BY ITSELF
      assert(q.awaitTermination(120000),
        "Trigger.AvailableNow query did not stop after draining")
      assert(spark.table("mt_availnow").select("id").as[Long]
        .collect().toSeq.sorted === (0L until 5L),
        "backfill must deliver every version exactly once")
      // and it drained in >= ceil(5/2) = 3 capped windows, not one gulp
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        s"expected >=3 data batches, got " +
          q.recentProgress.map(_.numInputRows).mkString(","))
    } finally { q.stop(); spark.catalog.dropTempView("mt_availnow") }
    // a SECOND AvailableNow run picks up only what landed after the
    // first (restart from the committed checkpoint = the frozen head);
    // memory sinks cannot recover a checkpoint, so land in parquet
    val ckpt = tmp("availnow_ckpt")
    val out = tmp("availnow_out")
    def runOnce(): Seq[Long] = {
      val q2 = spark.readStream.format("graft-manifest").load(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        assert(q2.awaitTermination(120000))
        spark.read.parquet(out).select("id").as[Long]
          .collect().toSeq.sorted
      } finally q2.stop()
    }
    assert(runOnce() === (0L until 5L))
    ManifestTable.append(batch(7, 8), dir, "b7")
    assert(runOnce() === (0L until 5L) ++ Seq(7L, 8L),
      "the second run must add only the post-freeze commits")
  }

  test("maxFilesPerTrigger / maxBytesPerTrigger cut micro-batches at commit granularity") {
    val dir = tmp("filelimit")
    (0 until 6).foreach(i =>
      ManifestTable.append(batch(i.toLong), dir, s"b$i")) // v1..v6, 1 file each
    val perVersion = ManifestTable.snapshot(spark, dir).files.size / 6.0
    require(perVersion == 1.0, s"fixture drifted: $perVersion files/version")
    // two files per trigger -> 2 versions per batch -> 3 data batches
    val q = spark.readStream.format("graft-manifest")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream.format("memory").queryName("mt_flim")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("mt_flim").select("id").as[Long]
        .collect().toSeq.sorted === (0L until 6L))
      assert(q.recentProgress.count(_.numInputRows > 0) === 3,
        q.recentProgress.map(_.numInputRows).mkString(","))
    } finally { q.stop(); spark.catalog.dropTempView("mt_flim") }
    // a 1-byte budget still admits ONE version per trigger (a commit is
    // atomic) -> 6 data batches, nothing lost
    val q2 = spark.readStream.format("graft-manifest")
      .option("maxBytesPerTrigger", "1").load(dir)
      .writeStream.format("memory").queryName("mt_blim")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("mt_blim").select("id").as[Long]
        .collect().toSeq.sorted === (0L until 6L))
      assert(q2.recentProgress.count(_.numInputRows > 0) === 6,
        q2.recentProgress.map(_.numInputRows).mkString(","))
    } finally { q2.stop(); spark.catalog.dropTempView("mt_blim") }
  }

  test("skipChangeCommits streams past row-level commits; the default stays the raise") {
    val dir = tmp("skipchanges")
    ManifestTable.append(batch(1, 2, 3), dir, "b0")           // v1
    assert(ManifestTable.updateWhere(spark, dir, "id = 2",
      Map("text" -> "'changed'"), "u0"))                      // v2: row-level
    ManifestTable.append(batch(7, 8), dir, "b1")              // v3
    val q = spark.readStream.format("graft-manifest")
      .option("skipChangeCommits", "true").load(dir)
      .writeStream.format("memory").queryName("mt_skip")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // the appends arrive; the update's commit contributes NOTHING
      // (neither the changed row nor its rewritten file-mates re-emit)
      assert(spark.table("mt_skip").select("id").as[Long]
        .collect().toSeq.sorted === Seq(1L, 2L, 3L, 7L, 8L))
      assert(spark.table("mt_skip").where("text = 'changed'").count()
        === 0L, "the skipped commit's rows must not surface")
    } finally { q.stop(); spark.catalog.dropTempView("mt_skip") }
  }

  test("readChangeFeed streams the typed CDC log, row ops included") {
    val dir = tmp("cdc")
    ManifestTable.append(batch(1, 2), dir, "b0")              // v1
    val q = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.format("memory").queryName("mt_cdc")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("mt_cdc")
        .select("id", "_change_type", "commit_version")
        .as[(Long, String, Long)].collect().toSeq.sorted ===
        Seq((1L, "insert", 1L), (2L, "insert", 1L)))
      // row-level commits WITH cdc keep streaming as typed changes
      ManifestTable.deleteWhere(spark, dir, "id = 1", "d0", cdc = true) // v2
      ManifestTable.updateWhere(spark, dir, "id = 2",
        Map("text" -> "upper(text)"), "u0", cdc = true)       // v3
      q.processAllAvailable()
      assert(spark.table("mt_cdc")
        .select("id", "text", "_change_type", "commit_version")
        .as[(Long, String, String, Long)].collect().toSeq.sorted ===
        Seq((1L, "doc 1", "delete", 2L), (1L, "doc 1", "insert", 1L),
          (2L, "DOC 2", "update_postimage", 3L),
          (2L, "doc 2", "insert", 1L),
          (2L, "doc 2", "update_preimage", 3L)))
    } finally { q.stop(); spark.catalog.dropTempView("mt_cdc") }
  }

  test("readChangeFeed fails the stream on a sidecar-less row-level commit") {
    val dir = tmp("cdcblind")
    ManifestTable.append(batch(1), dir, "b0")
    val q = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.format("memory").queryName("mt_cdcblind")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      ManifestTable.deleteWhere(spark, dir, "id = 1", "d0") // cdc off
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      assert(e.getMessage.contains("CDC sidecar") ||
        e.getCause.getMessage.contains("CDC sidecar"))
    } finally { q.stop(); spark.catalog.dropTempView("mt_cdcblind") }
  }

  test("the manifest SINK: exactly-once streamed appends, layout + blooms, end-to-end roundtrip") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp("sink")
    val ckpt = tmp("sink_ckpt")
    val source = MemoryStream[(Long, String)]
    val q = source.toDF().toDF("id", "city")
      .writeStream.format("graft-manifest")
      .option("checkpointLocation", ckpt)
      .partitionBy("city")
      .outputMode("append").start(dir)
    try {
      source.addData((1L, "sf"), (2L, "nyc"))
      q.processAllAvailable()
      source.addData((3L, "sf"))
      q.processAllAvailable()
    } finally q.stop()
    val snap = ManifestTable.snapshot(spark, dir)
    // each micro-batch is one manifest commit under a deterministic id
    assert(snap.batchIds === Set("stream-0", "stream-1"))
    // the writer's partitionBy declared the table layout; every file
    // carries its tuple
    assert(snap.partitionCols === Seq("city"))
    assert(snap.files.forall(f => snap.pvals.get(f).exists(_.contains("city"))))
    assert(ManifestTable.read(spark, dir).select("id").as[Long]
      .collect().toSeq.sorted === Seq(1L, 2L, 3L))
    // exactly-once: a replay of an absorbed batch id commits nothing
    val sink = new graft.ext.ManifestSink(dir, Seq("city"), Nil)
    sink.addBatch(1L, Seq((99L, "ber")).toDF("id", "city"))
    assert(ManifestTable.read(spark, dir).count() === 3L)
    assert(ManifestTable.snapshot(spark, dir).version === snap.version)
    // a RESTARTED query on the same checkpoint replays nothing either
    val q2 = source.toDF().toDF("id", "city")
      .writeStream.format("graft-manifest")
      .option("checkpointLocation", ckpt)
      .partitionBy("city")
      .outputMode("append").start(dir)
    try {
      source.addData((4L, "ber"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(ManifestTable.read(spark, dir).select("id").as[Long]
      .collect().toSeq.sorted === Seq(1L, 2L, 3L, 4L))
    // the streamed table feeds the manifest SOURCE: sink -> source
    // roundtrip through two real streaming queries
    val sinkView = "mt_sink_rt"
    val q3 = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("memory").queryName(sinkView)
      .outputMode("append").start()
    try {
      q3.processAllAvailable()
      assert(spark.table(sinkView).select("id").as[Long]
        .collect().toSeq.sorted === Seq(1L, 2L, 3L, 4L))
    } finally { q3.stop(); spark.catalog.dropTempView(sinkView) }
  }

  test("sink self-maintenance: bounded log, repacked small files, data intact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp("sinkmaint")
    val ckpt = tmp("sinkmaint_ckpt")
    val source = MemoryStream[(Long, String)]
    val q = source.toDF().toDF("id", "text")
      .writeStream.format("graft-manifest")
      .option("checkpointLocation", ckpt)
      .option("retainVersions", "3")
      .option("packSmallBytes", (1024L * 1024).toString)
      .option("maintainEvery", "2")
      .outputMode("append").start(dir)
    try {
      (0 until 8).foreach { k =>
        source.addData((0L until 20L).map(i =>
          (k * 20L + i, s"doc ${k * 20L + i}")): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val snap = ManifestTable.snapshot(spark, dir)
    // every streamed row present, exactly once
    assert(ManifestTable.read(spark, dir).select("id").as[Long]
      .collect().toSeq.sorted === (0L until 160L))
    // the trickle repacked: far fewer live files than commits
    assert(snap.files.size < 8, s"${snap.files.size} files — packing never ran")
    // the log expired on cadence: version 1's delta is gone, the head
    // window resolves, and a cold driver still reads the table
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val logNames = fsys.listStatus(
      new org.apache.hadoop.fs.Path(s"$dir/_manifest"))
      .map(_.getPath.getName).filter(_.matches("[vd]\\d{8,}")).toSeq
    assert(!logNames.contains("d00000001"),
      s"log never expired: ${logNames.sorted.mkString(", ")}")
    ManifestTable.clearSnapshotCacheForTest()
    assert(ManifestTable.read(spark, dir).count() === 160L)
    // replays of absorbed stream batches are still no-ops after all
    // the maintenance commits in between
    val sink = new graft.ext.ManifestSink(dir, Nil, Nil)
    sink.addBatch(3L, Seq((9999L, "dup")).toDF("id", "text"))
    assert(ManifestTable.read(spark, dir).count() === 160L)
  }

  test("maintenance failures surface (detail) and never fail the data batch") {
    val dir = tmp("sinkmainterr")
    // retainVersions = -1 makes every maintenance tick fail loudly
    // inside expireLog; the sink must commit the data batch anyway,
    // record the failure, and clear it on the next healthy tick
    val bad = new graft.ext.ManifestSink(dir, Nil, Nil,
      retainVersions = Some(-1L), maintainEvery = 1L)
    bad.addBatch(0L, Seq((1L, "a")).toDF("id", "text"))
    bad.addBatch(1L, Seq((2L, "b")).toDF("id", "text")) // tick fails
    assert(ManifestTable.read(spark, dir).count() === 2L,
      "a maintenance failure must never fail the data batch")
    val err = graft.ext.ManifestSink.lastMaintenanceError(dir)
    assert(err.exists(_.contains("retainVersions")),
      s"swallowed maintenance failure not surfaced: $err")
    assert(ManifestTable.detail(spark, dir).collect()(0)
      .getAs[String]("last_maintenance_error").contains("retainVersions"))
    // a healthy tick clears the signal
    val good = new graft.ext.ManifestSink(dir, Nil, Nil,
      retainVersions = Some(1000L), maintainEvery = 1L)
    good.addBatch(2L, Seq((3L, "c")).toDF("id", "text"))
    assert(graft.ext.ManifestSink.lastMaintenanceError(dir).isEmpty)
    assert(ManifestTable.detail(spark, dir).collect()(0)
      .getAs[String]("last_maintenance_error") == null)
  }

  test("an over-128MB packSmallBytes ticks cleanly: the target scales with it") {
    val dir = tmp("sinkbigpack")
    // the old sink passed packSmallBytes as minFileBytes with the
    // 128 MB default target — an inverted pair compactSmall now refuses
    // (its own guard) — so this tick would fail and surface; the sink
    // sizes targetFileBytes = max(128MB, 2x) instead and packs fine
    val sink = new graft.ext.ManifestSink(dir, Nil, Nil,
      packSmallBytes = Some(1024L * 1024 * 1024), maintainEvery = 2L)
    sink.addBatch(0L, (0L until 20L).map(i => (i, s"d$i")).toDF("id", "text"))
    sink.addBatch(1L, (20L until 40L).map(i => (i, s"d$i")).toDF("id", "text"))
    sink.addBatch(2L, (40L until 60L).map(i => (i, s"d$i")).toDF("id", "text"))
    assert(graft.ext.ManifestSink.lastMaintenanceError(dir).isEmpty,
      s"oversized packSmallBytes tick failed: ${graft.ext.ManifestSink
        .lastMaintenanceError(dir)}")
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.op === "compact", "the maintenance tick never packed")
    assert(ManifestTable.read(spark, dir).count() === 60L)
    // and the inverted pair is a loud error at the API level
    val e = intercept[IllegalArgumentException] {
      ManifestTable.compactSmall(spark, dir,
        targetFileBytes = 1024L, minFileBytes = 2048L)
    }
    assert(e.getMessage.contains("repack forever"))
  }

  test("the CDC stream over a sink-maintained table: packs invisible, inserts exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp("sinkcdc")
    val ckpt = tmp("sinkcdc_ckpt")
    val source = MemoryStream[(Long, String)]
    val q = source.toDF().toDF("id", "text")
      .writeStream.format("graft-manifest")
      .option("checkpointLocation", ckpt)
      .option("packSmallBytes", (1024L * 1024).toString)
      .option("maintainEvery", "2")
      .outputMode("append").start(dir)
    try {
      (0 until 5).foreach { k =>
        source.addData((0L until 10L).map(i =>
          (k * 10L + i, s"doc ${k * 10L + i}")): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // maintenance compactions happened (more commits than data batches)
    assert(ManifestTable.snapshot(spark, dir).version > 5L)
    // the full CDC replay sees each row ONCE, as an insert, at its own
    // data commit — every pack commit contributes nothing
    val sink = "mt_sinkcdc"
    val q2 = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true").load(dir)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      val rows = spark.table(sink)
        .select("id", "_change_type").as[(Long, String)].collect().toSeq
      assert(rows.forall(_._2 == "insert"))
      assert(rows.map(_._1).sorted === (0L until 50L))
    } finally { q2.stop(); spark.catalog.dropTempView(sink) }
  }

  test("the sink refuses non-append output modes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp("sinkmode")
    val source = MemoryStream[(Long, String)]
    val e = intercept[Exception] {
      source.toDF().toDF("id", "city").groupBy("city").count()
        .writeStream.format("graft-manifest")
        .option("checkpointLocation", tmp("sinkmode_ckpt"))
        .outputMode("complete").start(dir)
    }
    assert(e.getMessage.toLowerCase.contains("append"))
  }

  test("a row-level commit fails the stream instead of drifting") {
    val dir = tmp("rowop")
    ManifestTable.append(batch(1, 2), dir, "b0")
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("memory").queryName("mt_rowop")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      ManifestTable.deleteWhere(spark, dir, "id = 1", "d0")
      ManifestTable.append(batch(3), dir, "b1")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      assert(e.getMessage.contains("delete") ||
        e.getCause.getMessage.contains("delete"))
    } finally { q.stop(); spark.catalog.dropTempView("mt_rowop") }
  }
}
