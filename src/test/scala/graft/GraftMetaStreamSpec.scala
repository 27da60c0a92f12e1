package graft

import org.apache.spark.sql.DataFrame
import graft.ext.ManifestTable

/** SQL metadata faces (`SELECT * FROM cat.t.history|files|partitions|
  * detail|ndv`) and the catalog table as a STREAM
  * (`spark.readStream.table("cat.t")` rewriting to the graft-manifest
  * V1 source with options passing through).
  *
  * Own catalog name: Spark caches a catalog instance at first
  * reference, so a suite must never share a name with another suite's
  * different warehouse.
  */
class GraftMetaStreamSpec extends SparkSpec {
  import spark.implicits._

  private val wh = "/tmp/graft_test/gms_wh"

  private def sql(q: String): DataFrame = spark.sql(q)

  override def withFixture(test: NoArgTest) = {
    spark.conf.set("spark.sql.catalog.graft_ms", "graft.ext.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ms.warehouse", wh)
    super.withFixture(test)
  }

  private def fsDel(path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  test("metadata faces answer from manifest math: history/files/partitions/detail") {
    fsDel(s"$wh/t_meta")
    sql("CREATE TABLE graft_ms.t_meta (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    sql("INSERT INTO graft_ms.t_meta SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'de' ELSE 'en' END FROM range(100)")
    assert(ManifestTable.deleteWhereDV(spark, s"$wh/t_meta",
      "id < 10 AND lang = 'de'", "dv0"))

    val hist = sql("SELECT version, op FROM graft_ms.t_meta.history " +
      "ORDER BY version").collect()
    assert(hist.length >= 3) // create, insert, delete
    assert(hist.last.getString(1) === "delete")

    val snap = ManifestTable.snapshot(spark, s"$wh/t_meta")
    val files = sql("SELECT * FROM graft_ms.t_meta.files").collect()
    assert(files.length === snap.files.size)
    assert(files.map(_.getAs[Long]("dv_deleted_rows")).sum === 5L)
    // every live file carries recorded bytes, rows and its partition tuple
    files.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("bytes")))
      assert(!r.isNullAt(r.fieldIndex("rows")))
      assert(Set("de", "en").contains(
        r.getAs[Map[String, String]]("partition")("lang")))
    }

    val parts = sql("SELECT * FROM graft_ms.t_meta.partitions").collect()
    assert(parts.length === 2)

    assert(sql("SELECT * FROM graft_ms.t_meta.detail").count() === 1L)

    // a face of a missing table is still NoSuchTable, not a meta read
    val e = intercept[Exception](sql("SELECT * FROM graft_ms.nope.history"))
    assert(e.getMessage.toLowerCase.contains("cannot be found") ||
      e.getMessage.toLowerCase.contains("not found"))
  }

  test("ndv face surfaces the manifest HLL estimates for tracked columns") {
    fsDel(s"$wh/t_ndv")
    val df = (0L until 500L).map(i => (i, s"u${i % 37}")).toDF("id", "user")
    ManifestTable.append(df, s"$wh/t_ndv", "b0", ndvCols = Seq("user"))
    val ndv = sql("SELECT * FROM graft_ms.t_ndv.ndv").collect()
    assert(ndv.length === 1)
    assert(ndv.head.getString(0) === "user")
    val est = ndv.head.getLong(1)
    assert(est >= 30L && est <= 45L, s"ndv(user) estimated $est, true 37")
  }

  test("readStream.table streams a catalog table: batch parity, then live appends") {
    fsDel(s"$wh/t_stream")
    sql("CREATE TABLE graft_ms.t_stream (id BIGINT, lang STRING)")
    sql("INSERT INTO graft_ms.t_stream SELECT id, 'de' FROM range(50)")
    val sink = "gms_stream_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.table("graft_ms.t_stream")
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() === 50L)
      // a later SQL INSERT arrives as the next micro-batch
      sql("INSERT INTO graft_ms.t_stream SELECT id + 100, 'en' FROM range(7)")
      q.processAllAvailable()
      assert(spark.table(sink).count() === 57L)
      assert(spark.table(sink).where("lang = 'en'").count() === 7L)
    } finally { q.stop(); spark.catalog.dropTempView(sink) }
  }

  test("readStream.table passes reader options through: CDC columns + sinceVersion") {
    fsDel(s"$wh/t_scdc")
    // the change-feed property makes the SQL UPDATE record its CDC
    // sidecar — without it the feed refuses the sidecar-less commit
    sql("CREATE TABLE graft_ms.t_scdc (id BIGINT, n BIGINT) " +
      "TBLPROPERTIES ('graft.enableChangeFeed' = 'true')")
    sql("INSERT INTO graft_ms.t_scdc SELECT id, id * 10 FROM range(20)")
    sql("UPDATE graft_ms.t_scdc SET n = n + 1 WHERE id < 3")
    val sink = "gms_scdc_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream
      .option("readChangeFeed", "true")
      .table("graft_ms.t_scdc")
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table(sink)
      assert(got.columns.contains("_change_type") &&
        got.columns.contains("commit_version"))
      assert(got.where("_change_type = 'insert'").count() === 20L)
      assert(got.where("_change_type = 'update_postimage'").count() === 3L)
    } finally { q.stop(); spark.catalog.dropTempView(sink) }

    // sinceVersion skips history before the named commit
    val head = ManifestTable.headVersion(spark, s"$wh/t_scdc")
    sql("INSERT INTO graft_ms.t_scdc SELECT id + 500, 0 FROM range(4)")
    val sink2 = "gms_since_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q2 = spark.readStream
      .option("sinceVersion", head.toString)
      .table("graft_ms.t_scdc")
      .writeStream.format("memory").queryName(sink2)
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table(sink2).as[(Long, Long)].collect().map(_._1)
        .sorted.toSeq === Seq(500L, 501L, 502L, 503L))
    } finally { q2.stop(); spark.catalog.dropTempView(sink2) }
  }

  test("table properties: manifest-persisted, SQL round-trip, feed-invisible") {
    fsDel(s"$wh/t_props")
    sql("CREATE TABLE graft_ms.t_props (id BIGINT) " +
      "TBLPROPERTIES ('team' = 'data-eng')")
    sql("INSERT INTO graft_ms.t_props SELECT id FROM range(10)")
    def props = sql("SHOW TBLPROPERTIES graft_ms.t_props")
      .as[(String, String)].collect().toMap
    assert(props("team") === "data-eng")

    sql("ALTER TABLE graft_ms.t_props SET TBLPROPERTIES " +
      "('team' = 'ml', 'graft.enableChangeFeed' = 'true')")
    assert(props("team") === "ml")
    assert(props("graft.enableChangeFeed") === "true")
    // a cold snapshot (fresh read of the manifest) carries them too
    val snap = ManifestTable.snapshot(spark, s"$wh/t_props")
    assert(snap.properties === Map("team" -> "ml",
      "graft.enableChangeFeed" -> "true"))

    // property commits move no rows: the append feed spans them
    val feed = ManifestTable.appendsBetween(spark, s"$wh/t_props",
      0L, snap.version)
    assert(feed.count() === 10L)
    // and the SQL DELETE now records its sidecar (change feed on)
    sql("DELETE FROM graft_ms.t_props WHERE id < 4")
    val head = ManifestTable.headVersion(spark, s"$wh/t_props")
    val changes = ManifestTable.changesBetween(spark, s"$wh/t_props",
      snap.version, head)
    assert(changes.where("_change_type = 'delete'").count() === 4L)

    sql("ALTER TABLE graft_ms.t_props UNSET TBLPROPERTIES ('team')")
    assert(!props.contains("team"))
    assert(props("graft.enableChangeFeed") === "true")

    // the detail face surfaces properties and tags as their own columns
    ManifestTable.createTag(spark, s"$wh/t_props", "snap-a")
    val det = sql("SELECT * FROM graft_ms.t_props.detail").first()
    assert(det.getAs[String]("properties") === "graft.enableChangeFeed=true")
    assert(det.getAs[String]("tags").startsWith("snap-a="))
    ManifestTable.dropTag(spark, s"$wh/t_props", "snap-a")

    // 8 PARALLEL property commits (distinct keys) all land through the
    // manifest's CAS — same exactly-once contract as parallel appends
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence((0 until 8).map(i => Future {
      ManifestTable.setProperties(spark, s"$wh/t_props",
        Map(s"par.k$i" -> i.toString))
    })), 60.seconds)
    val snapPar = ManifestTable.snapshot(spark, s"$wh/t_props")
    (0 until 8).foreach(i =>
      assert(snapPar.properties.get(s"par.k$i").contains(i.toString),
        s"parallel property commit par.k$i lost"))
    ManifestTable.unsetProperties(spark, s"$wh/t_props",
      (0 until 8).map(i => s"par.k$i"))

    // checkpoint + log expiry: a cold replay FROM THE CHECKPOINT alone
    // still carries the properties (the v-file serializes them)
    ManifestTable.checkpoint(spark, s"$wh/t_props")
    ManifestTable.expireLog(spark, s"$wh/t_props", retainVersions = 0L)
    ManifestTable.clearSnapshotCacheForTest()
    assert(ManifestTable.snapshot(spark, s"$wh/t_props").properties ===
      Map("graft.enableChangeFeed" -> "true"))
  }
}
