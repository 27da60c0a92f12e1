package graft

import graft.ext.ManifestTable

/** Batch reader options through the catalog table name
  * ([[graft.plans.GraftReadOptions]]): `spark.read.option(...).table`
  * must mean what it says — the change feed, a pinned version, the
  * append feed — or raise; silently reading the table level (the old
  * behavior) is the one forbidden outcome.
  */
class ReadOptionsSpec extends SparkSpec {
  import spark.implicits._

  private val wh = "/tmp/graft_test/ropt_wh"

  override def withFixture(test: NoArgTest) = {
    spark.conf.set("spark.sql.catalog.graft_ropt", "graft.ext.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ropt.warehouse", wh)
    super.withFixture(test)
  }

  private def fsDel(path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  test("readChangeFeed through .table(): the typed CDC feed, star-expanded") {
    val dir = s"$wh/cdf"
    fsDel(dir)
    ManifestTable.append((0 until 10).map(i => (i.toLong, i.toLong))
      .toDF("id", "n"), dir, "b0")                                // v1
    ManifestTable.updateWhere(spark, dir, "id < 3",
      Map("n" -> "n + 100"), "u0", cdc = true)                    // v2
    val feed = spark.read.option("readChangeFeed", "true")
      .table("graft_ropt.cdf")
    // the rewrite ran at RESOLUTION: star expansion sees the CDC columns
    assert(feed.columns.toSeq ===
      Seq("id", "n", "_change_type", "commit_version"))
    val counts = feed.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(counts === Map("insert" -> 10L,
      "update_preimage" -> 3L, "update_postimage" -> 3L))
    // bounded range: startingVersion is INCLUSIVE (Delta CDF
    // convention) — 2 selects only the update's commit, 1 spans both
    val v2only = spark.read.option("readChangeFeed", "true")
      .option("startingVersion", "2").table("graft_ropt.cdf")
    assert(v2only.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap ===
      Map("update_preimage" -> 3L, "update_postimage" -> 3L))
    assert(spark.read.option("readChangeFeed", "true")
      .option("startingVersion", "1").table("graft_ropt.cdf")
      .count() === 16L)
    // 0 = the Delta "whole history" spelling (clamped, never underflows)
    assert(spark.read.option("readChangeFeed", "true")
      .option("startingVersion", "0").table("graft_ropt.cdf")
      .count() === 16L)
    // sinceVersion stays the EXCLUSIVE spelling of the same bound
    assert(spark.read.option("readChangeFeed", "true")
      .option("sinceVersion", "1").table("graft_ropt.cdf")
      .groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap ===
      Map("update_preimage" -> 3L, "update_postimage" -> 3L))
  }

  test("versionAsOf / sinceVersion options pin history and the append feed") {
    val dir = s"$wh/tt"
    fsDel(dir)
    ManifestTable.append((0 until 5).map(i => (i.toLong, "a"))
      .toDF("id", "s"), dir, "b0")                                // v1
    ManifestTable.append((5 until 9).map(i => (i.toLong, "b"))
      .toDF("id", "s"), dir, "b1")                                // v2
    assert(spark.read.option("versionAsOf", "1")
      .table("graft_ropt.tt").count() === 5L)
    assert(spark.read.table("graft_ropt.tt").count() === 9L)
    val sinceFeed = spark.read.option("sinceVersion", "1")
      .table("graft_ropt.tt")
    assert(sinceFeed.columns.toSeq === Seq("id", "s", "commit_version"))
    assert(sinceFeed.select("id").as[Long].collect().toSeq.sorted
      === (5L until 9L))
    // endingVersion bounds the append feed (fixed-window backfill)
    assert(spark.read.option("sinceVersion", "0")
      .option("endingVersion", "1").table("graft_ropt.tt")
      .select("id").as[Long].collect().toSeq.sorted === (0L until 5L))
  }

  test("writeStream.toTable through the catalog name hits the manifest sink") {
    val dir = s"$wh/wst"
    fsDel(dir)
    fsDel(s"$wh/wst_ckpt")
    spark.sql("DROP TABLE IF EXISTS graft_ropt.wst")
    spark.sql("CREATE TABLE graft_ropt.wst (id BIGINT, s STRING)")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    src.addData((1L, "a"), (2L, "b"))
    val q = src.toDF().toDF("id", "s").writeStream
      .format("graft-manifest")
      .option("checkpointLocation", s"$wh/wst_ckpt")
      .outputMode("append").toTable("graft_ropt.wst")
    try q.processAllAvailable() finally q.stop()
    // a real manifest commit, not a parquet directory dump
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.batchIds.exists(_.startsWith("stream-")),
      s"expected a stream-<n> manifest commit, got ${snap.batchIds}")
    assert(spark.sql("SELECT id FROM graft_ropt.wst ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    // without the format, Spark raises its provider-mismatch error —
    // loud, never a silent parquet write into the warehouse
    val e = intercept[Exception] {
      src.toDF().toDF("id", "s").writeStream
        .option("checkpointLocation", s"$wh/wst_ckpt2")
        .toTable("graft_ropt.wst")
    }
    assert(Option(e.getMessage).exists(m =>
      m.contains("graft-manifest") || m.toLowerCase.contains("provider")),
      e.getMessage)
  }

  test("an unrecognized reader option raises instead of reading the table level") {
    val dir = s"$wh/unk"
    fsDel(dir)
    ManifestTable.append(Seq((1L, "x")).toDF("id", "s"), dir, "b0")
    val e = intercept[Exception] {
      spark.read.option("readChangeFeeed", "true") // typo'd key
        .table("graft_ropt.unk").collect()
    }
    assert(Option(e.getMessage).exists(_.contains("unrecognized")),
      e.getMessage)
  }
}
