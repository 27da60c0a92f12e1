package graft

import org.apache.spark.sql.functions._
import graft.ext.ManifestTable

/** COLUMN MAPPING (rename/drop column as pure metadata commits):
  * logical names live in the manifest, physical parquet names are
  * frozen at write time, so a RENAME costs zero I/O and keeps every
  * recorded stat/bloom/partition value pruning, and a DROP retires the
  * physical name so re-adding the column can never resurrect the
  * dropped bytes. Mirrors Delta's column-mapping contract
  * (name-mapping mode) on the manifest log.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private val wh = "/tmp/graft_test/cmap_wh"

  override def withFixture(test: NoArgTest) = {
    spark.conf.set("spark.sql.catalog.graft_cmap", "graft.ext.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_cmap.warehouse", wh)
    super.withFixture(test)
  }

  private def fsDel(path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  test("rename is metadata-only: same files, new name reads, stats still prune") {
    val dir = s"$wh/ren"
    fsDel(dir)
    // id-banded appends so the band predicate provably prunes
    (0 until 4).foreach(b => ManifestTable.append(
      (b * 100 until (b + 1) * 100).map(i =>
        (i.toLong, s"body $i")).toDF("id", "text"), dir, s"b$b"))
    val before = ManifestTable.snapshot(spark, dir)
    assert(ManifestTable.renameColumn(spark, dir, "id", "doc_id"))
    val after = ManifestTable.snapshot(spark, dir)
    assert(after.files === before.files, "rename must move no data")
    assert(after.op === "metadata")
    // reads surface the NEW name, values byte-identical
    val got = ManifestTable.read(spark, dir)
    assert(got.columns.toSeq === Seq("doc_id", "text"))
    assert(got.agg(sum("doc_id")).as[Long].head() === (0L until 400L).sum)
    // the stats pruning fires on the NEW name (physical key unchanged)
    val (kept, total) = ManifestTable.pruneInfo(spark, dir,
      "doc_id >= 100 AND doc_id < 200")
    assert(kept < total && kept >= 1,
      s"rename lost stats pruning: kept $kept of $total")
    // time travel BELOW the rename answers with the OLD name
    assert(ManifestTable.readVersion(spark, dir, before.version)
      .columns.toSeq === Seq("id", "text"))
    // writes after the rename land under the stable physical name:
    // append with the new logical name, read the union back
    ManifestTable.append(Seq((400L, "body 400")).toDF("doc_id", "text"),
      dir, "b4")
    assert(ManifestTable.read(spark, dir).count() === 401L)
    assert(ManifestTable.read(spark, dir)
      .where("doc_id = 400").select("text").as[String].head() === "body 400")
    // row ops keep working through the translation: update on new name
    ManifestTable.updateWhere(spark, dir, "doc_id = 400",
      Map("text" -> "'updated'"), "u1")
    assert(ManifestTable.read(spark, dir)
      .where("doc_id = 400").select("text").as[String].head() === "updated")
  }

  test("drop retires the physical name; re-add binds a fresh slot, never the old bytes") {
    val dir = s"$wh/drop"
    fsDel(dir)
    ManifestTable.append((0 until 50).map(i =>
      (i.toLong, s"secret $i", i * 10L)).toDF("id", "text", "score"),
      dir, "b0")
    assert(ManifestTable.dropColumn(spark, dir, "text"))
    val got = ManifestTable.read(spark, dir)
    assert(got.columns.toSeq === Seq("id", "score"))
    // re-ADD the same name: values must be NULL (fresh slot), not the
    // dropped bytes
    assert(ManifestTable.addColumn(spark, dir, "text",
      org.apache.spark.sql.types.StringType))
    val readded = ManifestTable.read(spark, dir)
    assert(readded.columns.toSeq === Seq("id", "score", "text"))
    assert(readded.where("text IS NOT NULL").count() === 0L,
      "re-added column resurrected dropped bytes")
    // new appends fill the fresh slot; old rows stay null
    ManifestTable.append(Seq((100L, 0L, "fresh")).toDF("id", "score", "text"),
      dir, "b1")
    assert(ManifestTable.read(spark, dir)
      .where("text = 'fresh'").count() === 1L)
    assert(ManifestTable.read(spark, dir)
      .where("text IS NULL").count() === 50L)
    // an APPEND trying to re-introduce the retired name directly (no
    // ALTER) is rejected — it would bind the orphaned bytes
    fsDel(s"$wh/drop2")
    ManifestTable.append((0 until 5).map(i => (i.toLong, s"s$i"))
      .toDF("id", "text"), s"$wh/drop2", "b0")
    ManifestTable.dropColumn(spark, s"$wh/drop2", "text")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.append(Seq((9L, "x")).toDF("id", "text"),
        s"$wh/drop2", "b1")
    }
    assert(e.getMessage.contains("physical name"))
  }

  test("SQL face: ALTER TABLE RENAME/DROP COLUMN, planner scan still prunes, DML works") {
    fsDel(s"$wh/sqlren")
    spark.sql("DROP TABLE IF EXISTS graft_cmap.sqlren")
    spark.sql("CREATE TABLE graft_cmap.sqlren (id BIGINT, v STRING, n BIGINT)")
    (0 until 4).foreach(b => spark.sql(
      s"INSERT INTO graft_cmap.sqlren SELECT id, concat('v', id), id " +
        s"FROM range(${b * 100}, ${(b + 1) * 100})"))
    spark.sql("ALTER TABLE graft_cmap.sqlren RENAME COLUMN id TO row_id")
    // the planner-integrated scan: filter on the NEW name, numFiles
    // proves manifest stats pruned on the stable physical key
    val probe = spark.sql(
      "SELECT row_id, v FROM graft_cmap.sqlren WHERE row_id < 100")
    assert(probe.count() === 100L)
    val read = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }
    val total = ManifestTable.snapshot(spark, s"$wh/sqlren").files.size
    assert(read.nonEmpty && read.sum < total,
      s"renamed-column scan read ${read.sum} of $total files — pruning lost")
    // DML through the new name
    spark.sql("UPDATE graft_cmap.sqlren SET n = n + 1000 WHERE row_id < 10")
    assert(spark.sql(
      "SELECT CAST(sum(n) AS BIGINT) FROM graft_cmap.sqlren WHERE row_id < 10")
      .as[Long].head() === (0L until 10L).sum + 10000L)
    // DROP via SQL; SELECT * no longer shows it
    spark.sql("ALTER TABLE graft_cmap.sqlren DROP COLUMN v")
    assert(spark.sql("SELECT * FROM graft_cmap.sqlren").columns.toSeq
      === Seq("row_id", "n"))
  }

  test("change feed spans a rename: sidecars bind physical, surface logical") {
    val dir = s"$wh/cdc"
    fsDel(dir)
    ManifestTable.create(spark, dir, org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType))))
    ManifestTable.append((0 until 10).map(i => (i.toLong, i.toLong))
      .toDF("id", "n"), dir, "b0")
    val v0 = ManifestTable.headVersion(spark, dir)
    ManifestTable.renameColumn(spark, dir, "n", "score")
    // a CDC update AFTER the rename writes its sidecar physical
    ManifestTable.updateWhere(spark, dir, "id < 3",
      Map("score" -> "score + 100"), "u1", cdc = true)
    val head = ManifestTable.headVersion(spark, dir)
    val feed = ManifestTable.changesBetween(spark, dir, v0, head)
    assert(feed.columns.toSeq ===
      Seq("id", "score", "_change_type", "commit_version"))
    val post = feed.where("_change_type = 'update_postimage'")
      .select("id", "score").as[(Long, Long)].collect().toSeq.sorted
    assert(post === Seq((0L, 100L), (1L, 101L), (2L, 102L)))
  }

  test("guards: partition columns, constrained columns, duplicate targets") {
    val dir = s"$wh/guard"
    fsDel(dir)
    ManifestTable.append((0 until 10).map(i =>
      (i.toLong, if (i % 2 == 0) "de" else "en", i * 1L))
      .toDF("id", "lang", "n"), dir, "b0", partitionBy = Seq("lang"))
    ManifestTable.addConstraint(spark, dir, "n_pos", "n >= 0")
    def fails(f: => Any, needle: String): Unit = {
      val e = intercept[Exception](f)
      assert(Option(e.getMessage).exists(_.contains(needle)), e.getMessage)
    }
    fails(ManifestTable.renameColumn(spark, dir, "lang", "language"),
      "partition")
    fails(ManifestTable.dropColumn(spark, dir, "lang"), "partition")
    fails(ManifestTable.renameColumn(spark, dir, "n", "m"), "constraint")
    fails(ManifestTable.dropColumn(spark, dir, "n"), "constraint")
    fails(ManifestTable.renameColumn(spark, dir, "id", "n"),
      "already exists")
    fails(ManifestTable.renameColumn(spark, dir, "ghost", "g"),
      "does not exist")
    // dropping the constraint unblocks the rename; pruning on the new
    // name still fires via partition values (identity-mapped)
    ManifestTable.dropConstraint(spark, dir, "n_pos")
    assert(ManifestTable.renameColumn(spark, dir, "n", "m"))
    val (kept, total) = ManifestTable.pruneInfo(spark, dir, "lang = 'de'")
    assert(kept < total, "partition pruning lost after an unrelated rename")
  }

  test("type widening: metadata-only, old narrow files upcast, stats still prune") {
    val dir = s"$wh/widen"
    fsDel(dir)
    // banded INT appends: the band predicate must prune AFTER widening
    (0 until 3).foreach(b => ManifestTable.append(
      (b * 100 until (b + 1) * 100).map(i => (i.toLong, i, i.toFloat))
        .toDF("id", "n", "x")
        .selectExpr("id", "CAST(n AS INT) AS n", "x"), dir, s"b$b"))
    val before = ManifestTable.snapshot(spark, dir)
    assert(ManifestTable.widenColumnType(spark, dir, "n",
      org.apache.spark.sql.types.LongType))
    assert(ManifestTable.widenColumnType(spark, dir, "x",
      org.apache.spark.sql.types.DoubleType))
    val after = ManifestTable.snapshot(spark, dir)
    assert(after.files === before.files, "widening must move no data")
    val got = ManifestTable.read(spark, dir)
    assert(got.schema("n").dataType === org.apache.spark.sql.types.LongType)
    assert(got.schema("x").dataType === org.apache.spark.sql.types.DoubleType)
    // the narrow physical files upcast: values intact
    assert(got.agg(sum("n")).as[Long].head() === (0L until 300L).sum)
    // stats recorded under the narrow type still prune the wide predicate
    val (kept, total) = ManifestTable.pruneInfo(spark, dir,
      "n >= 100 AND n < 200")
    assert(kept < total && kept >= 1,
      s"widening lost stats pruning: kept $kept of $total")
    // values only a wide column can hold land and read back
    ManifestTable.append(Seq((300L, 5000000000L, 1.5))
      .toDF("id", "n", "x"), dir, "b3")
    assert(ManifestTable.read(spark, dir).where("n > 4000000000")
      .count() === 1L)
    // everything outside the lattice is a loud no
    def fails(to: org.apache.spark.sql.types.DataType, col: String): Unit = {
      val e = intercept[Exception](
        ManifestTable.widenColumnType(spark, dir, col, to))
      assert(e.getMessage.contains("not a widening"), e.getMessage)
    }
    fails(org.apache.spark.sql.types.IntegerType, "n")   // narrowing
    fails(org.apache.spark.sql.types.StringType, "n")    // cross-family
    fails(org.apache.spark.sql.types.FloatType, "x")     // narrowing
    // SQL face drives the same path
    spark.sql("DROP TABLE IF EXISTS graft_cmap.widensql")
    fsDel(s"$wh/widensql")
    spark.sql("CREATE TABLE graft_cmap.widensql (id BIGINT, n INT)")
    spark.sql("INSERT INTO graft_cmap.widensql SELECT id, CAST(id AS INT) " +
      "FROM range(10)")
    spark.sql("ALTER TABLE graft_cmap.widensql ALTER COLUMN n TYPE BIGINT")
    spark.sql("INSERT INTO graft_cmap.widensql VALUES (99, 6000000000)")
    assert(spark.sql("SELECT CAST(sum(n) AS BIGINT) FROM graft_cmap.widensql")
      .as[Long].head() === (0L until 10L).sum + 6000000000L)
  }

  test("restore below a rename restores the old logical names on the same bytes") {
    val dir = s"$wh/restore"
    fsDel(dir)
    ManifestTable.append((0 until 20).map(i => (i.toLong, i * 2L))
      .toDF("id", "n"), dir, "b0")
    val v0 = ManifestTable.headVersion(spark, dir)
    ManifestTable.renameColumn(spark, dir, "n", "score")
    assert(ManifestTable.read(spark, dir).columns.toSeq === Seq("id", "score"))
    assert(ManifestTable.restore(spark, dir, v0, "r1"))
    val got = ManifestTable.read(spark, dir)
    assert(got.columns.toSeq === Seq("id", "n"))
    assert(got.agg(sum("n")).as[Long].head() === (0L until 20L).map(_ * 2).sum)
  }
}
