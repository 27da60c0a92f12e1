package graft

import graft.ext.ManifestTable

/** Atomic `[CREATE OR] REPLACE TABLE [AS SELECT]`
  * ([[graft.ext.GraftCatalog]]'s staging seam →
  * [[ManifestTable.replaceTable]]): the whole definition and contents
  * swap in ONE manifest commit, and — unlike Spark's DROP+CREATE
  * fallback — the table's history survives: time travel answers below
  * the replace, restore undoes it, the CDC feed spans it.
  */
class ReplaceTableSpec extends SparkSpec {
  import spark.implicits._

  private val wh = "/tmp/graft_test/repl_wh"

  override def withFixture(test: NoArgTest) = {
    spark.conf.set("spark.sql.catalog.graft_rp", "graft.ext.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_rp.warehouse", wh)
    super.withFixture(test)
  }

  private def fsDel(path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  test("RTAS is one commit; history survives and time-travels below it") {
    val dir = s"$wh/r1"
    fsDel(dir)
    spark.sql("CREATE TABLE graft_rp.r1 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft_rp.r1 VALUES (1,'a'),(2,'b')")
    val vBefore = ManifestTable.headVersion(spark, dir)
    spark.sql("CREATE OR REPLACE TABLE graft_rp.r1 AS " +
      "SELECT id, id * 10 AS score FROM range(5)")
    val snap = ManifestTable.snapshot(spark, dir)
    // ONE commit, op 'replace' — not a DROP + CREATE pair
    assert(snap.version === vBefore + 1)
    assert(snap.op === "replace")
    assert(spark.sql("SELECT * FROM graft_rp.r1").columns.toSeq
      === Seq("id", "score"))
    assert(spark.sql("SELECT CAST(sum(score) AS BIGINT) FROM graft_rp.r1")
      .as[Long].head() === (0L until 5L).map(_ * 10).sum)
    // the pre-replace contents still time-travel (the log was NOT erased)
    val old = spark.sql(
      s"SELECT * FROM graft_rp.r1 VERSION AS OF $vBefore ORDER BY id")
    assert(old.columns.toSeq === Seq("id", "v"))
    assert(old.as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b")))
    // and restore undoes the replace entirely
    assert(ManifestTable.restore(spark, dir, vBefore, "undo"))
    assert(spark.sql("SELECT * FROM graft_rp.r1 ORDER BY id")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b")))
  }

  test("bare CREATE OR REPLACE swaps schema/layout/properties; REPLACE needs a table") {
    val dir = s"$wh/r2"
    fsDel(dir)
    spark.sql("CREATE TABLE graft_rp.r2 (id BIGINT) " +
      "TBLPROPERTIES ('keep' = 'no')")
    spark.sql("INSERT INTO graft_rp.r2 VALUES (1), (2)")
    spark.sql("CREATE OR REPLACE TABLE graft_rp.r2 " +
      "(doc_id BIGINT, lang STRING) PARTITIONED BY (lang) " +
      "TBLPROPERTIES ('fresh' = 'yes')")
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.files.isEmpty && snap.op === "replace")
    assert(snap.partitionCols === Seq("lang"))
    assert(snap.properties.get("fresh").contains("yes") &&
      !snap.properties.contains("keep"))
    // the new layout binds writes; partition pruning works immediately
    spark.sql("INSERT INTO graft_rp.r2 VALUES (1, 'de'), (2, 'en')")
    val (kept, total) = ManifestTable.pruneInfo(spark, dir, "lang = 'de'")
    assert(kept < total)
    // un-partitioned REPLACE of a partitioned table round-trips too
    // (the empty layout list must survive the log)
    spark.sql("CREATE OR REPLACE TABLE graft_rp.r2 (x BIGINT)")
    assert(ManifestTable.snapshot(spark, dir).partitionCols === Nil)
    spark.sql("INSERT INTO graft_rp.r2 VALUES (7)")
    assert(spark.sql("SELECT x FROM graft_rp.r2").as[Long].head() === 7L)
    // REPLACE TABLE (no OR CREATE) on a missing table is a loud no
    val e = intercept[Exception] {
      spark.sql("REPLACE TABLE graft_rp.ghost (id BIGINT)")
    }
    assert(e.getMessage.toLowerCase.contains("not found") ||
      e.getMessage.contains("ghost"), e.getMessage)
  }

  test("the CDC feed spans a replace as a synthesized snapshot diff") {
    val dir = s"$wh/r3"
    fsDel(dir)
    ManifestTable.append((0 until 4).map(i => (i.toLong, i.toLong))
      .toDF("id", "n"), dir, "b0")                                 // v1
    spark.sql("CREATE OR REPLACE TABLE graft_rp.r3 AS " +
      "SELECT id, id + 100 AS n FROM range(2)")                    // v2
    val feed = ManifestTable.changesBetween(spark, dir, 1L, 2L)
    val got = feed.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(got === Map("delete" -> 4L, "insert" -> 2L))
    assert(feed.where("_change_type = 'insert'")
      .selectExpr("CAST(sum(n) AS BIGINT)").as[Long].head() === 201L)
  }

  test("atomic CTAS: one 'replace' commit, rides the append-only feed") {
    val dir = s"$wh/r4"
    fsDel(dir)
    spark.sql("DROP TABLE IF EXISTS graft_rp.r4")
    spark.sql("CREATE TABLE graft_rp.r4 AS SELECT id FROM range(3)")
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.version === 1L && snap.op === "replace")
    // zero files removed -> the pure-insert proof lets CTAS ride the
    // append feed like any first batch
    assert(ManifestTable.appendsBetween(spark, dir, 0L, 1L).count() === 3L)
    // IF NOT EXISTS on an existing table stays a no-op
    spark.sql("CREATE TABLE IF NOT EXISTS graft_rp.r4 AS SELECT id FROM range(9)")
    assert(spark.sql("SELECT count(*) FROM graft_rp.r4").as[Long].head() === 3L)
  }

  test("replace of a column-mapped table resets to a fresh identity") {
    val dir = s"$wh/r5"
    fsDel(dir)
    ManifestTable.append((0 until 3).map(i => (i.toLong, i.toLong))
      .toDF("id", "n"), dir, "b0")
    ManifestTable.renameColumn(spark, dir, "n", "score")
    spark.sql("CREATE OR REPLACE TABLE graft_rp.r5 AS " +
      "SELECT id, id AS n FROM range(4)")
    // the new 'n' binds the NEW files, not the renamed-away physical 'n'
    assert(spark.sql("SELECT CAST(sum(n) AS BIGINT) FROM graft_rp.r5")
      .as[Long].head() === (0L until 4L).sum)
    val (kept, total) = ManifestTable.pruneInfo(spark, dir, "n >= 2")
    assert(kept <= total && total === ManifestTable.snapshot(spark, dir)
      .files.size)
  }
}
