package graft

import org.apache.spark.sql.DataFrame
import graft.ext.ManifestTable

/** The SQL DDL/DML face (VERDICT r13 order #1) and the DV-aware planner
  * scan (order #2): a DSv2 `TableCatalog` over manifest tables, so
  * CREATE/INSERT/SELECT/DELETE/OVERWRITE/time-travel run from plain
  * `spark.sql`, with SELECT planning through `ManifestFileIndex`
  * (FileSourceScanExec + manifest stats pruning — pinned by numFiles
  * metrics), and tables carrying outstanding deletion vectors answering
  * the union plan instead of refusing.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val wh = "/tmp/graft_test/gcat_wh"

  private def sql(q: String): DataFrame = spark.sql(q)

  override def withFixture(test: NoArgTest) = {
    spark.conf.set("spark.sql.catalog.graft", "graft.ext.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    super.withFixture(test)
  }

  private def fsDel(path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  /** Files read by every FileSourceScanExec in df's executed plan —
    * the observable pinning that SQL reads go through the pruned
    * ManifestFileIndex (collect() first: metrics fill on execution).
    */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }
    require(scans.nonEmpty, "plan has no FileSourceScanExec — the SQL " +
      "read did not go through ManifestFileIndex:\n" +
      df.queryExecution.executedPlan.toString)
    scans.sum
  }

  test("CREATE TABLE + empty SELECT + INSERT + SELECT round-trip, all SQL") {
    fsDel(s"$wh/t_basic")
    sql("CREATE TABLE graft.t_basic (id BIGINT, lang STRING, n BIGINT)")
    // a created-but-empty table is readable with real columns
    val empty = sql("SELECT * FROM graft.t_basic")
    assert(empty.columns.toSeq === Seq("id", "lang", "n"))
    assert(empty.count() === 0L)
    sql("INSERT INTO graft.t_basic VALUES (1, 'de', 10), (2, 'en', 20)")
    sql("INSERT INTO graft.t_basic SELECT id + 10, lang, n FROM graft.t_basic")
    assert(sql("SELECT * FROM graft.t_basic").count() === 4L)
    assert(sql("SELECT CAST(sum(n) AS BIGINT) AS s FROM graft.t_basic")
      .as[Long].head() === 60L)
    // the SQL write went through the manifest: the Scala face agrees
    assert(ManifestTable.read(spark, s"$wh/t_basic").count() === 4L)
    assert(ManifestTable.snapshot(spark, s"$wh/t_basic").op === "append")
  }

  test("SQL SELECT plans through ManifestFileIndex and PRUNES (numFiles)") {
    fsDel(s"$wh/t_prune")
    val docs = (0L until 4000L)
      .map(i => (i, s"document body $i with some ballast text"))
      .toDF("id", "text")
    ManifestTable.append(docs, s"$wh/t_prune", "b0")
    ManifestTable.compact(spark, s"$wh/t_prune",
      targetFileBytes = 4L * 1024, clusterBy = Seq("id"))
    val total = ManifestTable.snapshot(spark, s"$wh/t_prune").files.size
    require(total > 3, s"fixture degenerate: $total files")
    // full scan touches every file; a selective band PRUNES
    assert(scannedFiles(sql("SELECT * FROM graft.t_prune")) === total)
    val banded = sql("SELECT * FROM graft.t_prune WHERE id >= 100 AND id < 140")
    assert(banded.count() === 40L) // scannedFiles re-collects for metrics
    val read = scannedFiles(banded)
    assert(read < total / 2,
      s"SQL band read $read of $total files — manifest stats did not prune")
  }

  test("partitioned DDL: PARTITIONED BY prunes exactly; DELETE is metadata") {
    fsDel(s"$wh/t_part")
    sql("CREATE TABLE graft.t_part (id BIGINT, city STRING) PARTITIONED BY (city)")
    sql("INSERT INTO graft.t_part SELECT id, CASE WHEN id % 3 = 0 THEN 'sf' " +
      "WHEN id % 3 = 1 THEN 'nyc' ELSE 'ber' END FROM range(90)")
    val s = ManifestTable.snapshot(spark, s"$wh/t_part")
    assert(s.partitionCols === Seq("city"))
    val sfFiles = s.files.count(f => s.pvals(f)("city").value.contains("sf"))
    assert(sfFiles > 0 && sfFiles < s.files.size)
    assert(scannedFiles(
      sql("SELECT * FROM graft.t_part WHERE city = 'sf'")) === sfFiles)
    // DELETE of a whole partition: pure metadata commit (no new files)
    sql("DELETE FROM graft.t_part WHERE city = 'sf'")
    val after = ManifestTable.snapshot(spark, s"$wh/t_part")
    assert(after.files.toSet.subsetOf(s.files.toSet),
      "partition delete must not rewrite files")
    assert(sql("SELECT count(*) FROM graft.t_part").as[Long].head() === 60L)
    assert(sql("SELECT count(*) FROM graft.t_part WHERE city = 'sf'")
      .as[Long].head() === 0L)
  }

  test("row-level DELETE (CoW), INSERT OVERWRITE, and TIME TRAVEL via SQL") {
    fsDel(s"$wh/t_ops")
    sql("CREATE TABLE graft.t_ops (id BIGINT, n BIGINT)")
    sql("INSERT INTO graft.t_ops SELECT id, id * 2 FROM range(100)") // v2
    sql("DELETE FROM graft.t_ops WHERE id >= 90")                    // v3
    assert(sql("SELECT count(*) FROM graft.t_ops").as[Long].head() === 90L)
    sql("INSERT OVERWRITE graft.t_ops SELECT id, id * 3 FROM range(10)") // v4
    assert(sql("SELECT CAST(sum(n) AS BIGINT) FROM graft.t_ops")
      .as[Long].head() === (0L until 10L).map(_ * 3).sum)
    // time travel reads the pre-overwrite, pre-delete states
    assert(sql("SELECT count(*) FROM graft.t_ops VERSION AS OF 2")
      .as[Long].head() === 100L)
    assert(sql("SELECT count(*) FROM graft.t_ops VERSION AS OF 3")
      .as[Long].head() === 90L)
  }

  test("CTAS, SHOW TABLES, DROP TABLE, and catalog/Scala interop") {
    fsDel(s"$wh/t_ctas")
    fsDel(s"$wh/t_src")
    ManifestTable.append(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), s"$wh/t_src", "b0")
    sql("CREATE TABLE graft.t_ctas AS SELECT id, upper(v) AS v FROM graft.t_src")
    assert(sql("SELECT * FROM graft.t_ctas ORDER BY id")
      .as[(Long, String)].collect().toSeq === Seq((1L, "A"), (2L, "B")))
    val listed = sql("SHOW TABLES IN graft").select("tableName")
      .as[String].collect().toSet
    assert(listed.contains("t_ctas") && listed.contains("t_src"))
    sql("DROP TABLE graft.t_ctas")
    assert(!spark.catalog.tableExists("graft.t_ctas"))
    val e = intercept[Exception] { sql("SELECT * FROM graft.t_ctas") }
    assert(e.getMessage.contains("t_ctas"))
  }

  test("DV-carrying tables answer SQL and scan() — the refusal is lifted") {
    fsDel(s"$wh/t_dv")
    val docs = (0L until 300L).map(i => (i, s"doc $i")).toDF("id", "text")
    ManifestTable.append(docs, s"$wh/t_dv", "b0")
    // 512 B target: the optimized write packs the tiny corpus into one
    // file, so the multi-file fixture layout must be asked for in bytes
    ManifestTable.compact(spark, s"$wh/t_dv",
      targetFileBytes = 512L, clusterBy = Seq("id"))
    // a point delete lands a DV on ONE file, everything else untouched
    assert(ManifestTable.deleteWhereDV(spark, s"$wh/t_dv", "id = 7", "d0"))
    val s = ManifestTable.snapshot(spark, s"$wh/t_dv")
    val dvd = s.files.filter(f => s.dvs.get(f).exists(_.nonEmpty))
    assert(dvd.size === 1, s"fixture expected one DV'd file, got ${dvd.size}")
    // exact rows through BOTH faces
    assert(ManifestTable.scan(spark, s"$wh/t_dv").count() === 299L)
    assert(sql("SELECT count(*) FROM graft.t_dv").as[Long].head() === 299L)
    assert(sql("SELECT count(*) FROM graft.t_dv WHERE id = 7")
      .as[Long].head() === 0L)
    // stats-excluded CLEAN files still prune: a band away from the DV'd
    // file reads only its own files through the FileSourceScanExec
    val total = s.files.size
    val banded = ManifestTable.scan(spark, s"$wh/t_dv")
      .where("id >= 200 AND id < 240")
    assert(banded.count() === 40L)
    val read = banded.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.sum
    assert(read < total / 2,
      s"DV-aware scan read $read of $total files — clean branch did not prune")
    // composition: a filter ABOVE the union prunes into the clean branch
    assert(ManifestTable.scan(spark, s"$wh/t_dv")
      .where("id >= 5 AND id < 10").select("id")
      .as[Long].collect().toSeq.sorted === Seq(5L, 6L, 8L, 9L))
  }

  test("V2 scan reports DV-adjusted manifest statistics (extension-less broadcast)") {
    fsDel(s"$wh/t_stats")
    val docs = (0L until 1000L)
      .map(i => (i, s"doc $i with ballast text")).toDF("id", "text")
    ManifestTable.append(docs, s"$wh/t_stats", "b0")
    ManifestTable.compact(spark, s"$wh/t_stats",
      targetFileBytes = 4L * 1024, clusterBy = Seq("id"))
    assert(ManifestTable.deleteWhereDV(spark, s"$wh/t_stats",
      "id < 400", "d0"))
    val tbl = new graft.ext.GraftTableV2(spark, s"$wh/t_stats",
      "graft.t_stats", pinned = None)
    val scan = tbl.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty).build()
    val stats = scan.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    // exact visible rows; bytes scaled below raw by the deleted fraction
    assert(stats.numRows().getAsLong === 600L)
    val snap = tbl.snap
    val raw = snap.files.map(snap.sizes).sum
    assert(stats.sizeInBytes().getAsLong > 0L
      && stats.sizeInBytes().getAsLong < raw,
      s"effective ${stats.sizeInBytes()} must undercut raw $raw")
  }

  test("SQL faces refuse what they cannot express, loudly") {
    fsDel(s"$wh/t_err")
    sql("CREATE TABLE graft.t_err (id BIGINT, v STRING)")
    // duplicate creation raises the standard exception
    val e = intercept[Exception] {
      sql("CREATE TABLE graft.t_err (id BIGINT)")
    }
    assert(e.getMessage.toLowerCase.contains("already exists"))
    // non-identity partition transforms are a loud no
    fsDel(s"$wh/t_bucket")
    val e2 = intercept[Exception] {
      sql("CREATE TABLE graft.t_bucket (id BIGINT) PARTITIONED BY (bucket(4, id))")
    }
    assert(e2.getMessage.contains("identity"))
    // NARROWING type changes die in Spark's own analyzer (canUpCast
    // fails before our catalog is consulted)...
    val e3 = intercept[Exception] {
      sql("ALTER TABLE graft.t_err ALTER COLUMN id TYPE INT")
    }
    assert(e3.getMessage.contains("not supported"))
    // ...and cross-family changes Spark WOULD up-cast (long -> string)
    // hit the manifest's own family-widening guard — binding a string
    // decoder to integer bytes is not a metadata operation
    val e4 = intercept[Exception] {
      sql("ALTER TABLE graft.t_err ALTER COLUMN id TYPE STRING")
    }
    assert(e4.getMessage.contains("not a widening"))
  }

  test("ALTER TABLE ADD COLUMN: metadata-only evolution, old rows null-fill") {
    fsDel(s"$wh/t_alter")
    sql("CREATE TABLE graft.t_alter (id BIGINT, v STRING)")
    sql("INSERT INTO graft.t_alter VALUES (1, 'a'), (2, 'b')")
    val filesBefore = ManifestTable.snapshot(spark, s"$wh/t_alter").files.toSet
    sql("ALTER TABLE graft.t_alter ADD COLUMN score BIGINT")
    // nothing rewrote — one metadata commit
    assert(ManifestTable.snapshot(spark, s"$wh/t_alter").files.toSet
      === filesBefore)
    // old rows null-fill; new inserts carry the column
    sql("INSERT INTO graft.t_alter VALUES (3, 'c', 30)")
    assert(sql("SELECT id, score FROM graft.t_alter ORDER BY id")
      .as[(Long, Option[Long])].collect().toSeq ===
      Seq((1L, None), (2L, None), (3L, Some(30L))))
    // duplicates raise
    val e = intercept[Exception] {
      sql("ALTER TABLE graft.t_alter ADD COLUMN score BIGINT")
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("ALTER COLUMN SET/DROP NOT NULL: DROP is metadata-only, SET validates rows and enforces") {
    fsDel(s"$wh/t_null")
    sql("CREATE TABLE graft.t_null (id BIGINT NOT NULL, v STRING)")
    sql("INSERT INTO graft.t_null VALUES (1, 'a'), (2, NULL)")
    val files0 = ManifestTable.snapshot(spark, s"$wh/t_null").files.toSet
    // DROP NOT NULL: pure metadata, wider contract always safe
    sql("ALTER TABLE graft.t_null ALTER COLUMN id DROP NOT NULL")
    assert(ManifestTable.snapshot(spark, s"$wh/t_null").files.toSet
      === files0, "DROP NOT NULL must not move data")
    assert(spark.table("graft.t_null").schema("id").nullable)
    // SET NOT NULL on a column holding NULLs: the validation aggregate
    // refuses — never a silent lie in the schema
    val bad = intercept[Exception] {
      sql("ALTER TABLE graft.t_null ALTER COLUMN v SET NOT NULL")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(bad).exists(_.contains("existing row(s) are NULL")),
      msgs(bad).mkString(" | "))
    // on a clean column it lands as metadata and ENFORCES both paths
    sql("ALTER TABLE graft.t_null ALTER COLUMN id SET NOT NULL")
    assert(!spark.table("graft.t_null").schema("id").nullable)
    assert(ManifestTable.snapshot(spark, s"$wh/t_null").files.toSet
      === files0, "SET NOT NULL must not move data")
    // SQL INSERT of NULL: Spark's own analysis/runtime nullability check
    assert(intercept[Exception] {
      sql("INSERT INTO graft.t_null VALUES (NULL, 'x')")
    } != null)
    // Scala append of NULL: the constraint pass catches it
    val scalaNull = intercept[Exception] {
      ManifestTable.append(
        Seq((None: Option[Long], "y")).toDF("id", "v"),
        s"$wh/t_null", "bnull")
    }
    assert(msgs(scalaNull).exists(_.contains("IS NOT NULL")),
      msgs(scalaNull).mkString(" | "))
    // a batch OMITTING the NOT NULL column entirely is refused too —
    // reads would null-fill it, the silent lie the declaration forbids
    val omitted = intercept[Exception] {
      ManifestTable.append(Seq("z").toDF("v"), s"$wh/t_null", "bomit")
    }
    assert(msgs(omitted).exists(_.contains("omits NOT NULL")),
      msgs(omitted).mkString(" | "))
    // UPDATE cannot write NULL into it either (SET rides the same pass)
    val updNull = intercept[Exception] {
      sql("UPDATE graft.t_null SET id = NULL WHERE id = 1")
    }
    assert(msgs(updNull).exists(_.contains("IS NOT NULL")),
      msgs(updNull).mkString(" | "))
    // nor can a MERGE clause
    spark.range(1, 2).selectExpr("id AS k").createOrReplaceTempView("tn_src")
    val mrgNull = intercept[Exception] {
      sql("""MERGE INTO graft.t_null t USING tn_src s ON t.id = s.k
            |WHEN MATCHED THEN UPDATE SET id = NULL""".stripMargin)
    }
    assert(msgs(mrgNull).exists(_.contains("IS NOT NULL")),
      msgs(mrgNull).mkString(" | "))
    assert(sql("SELECT count(*) FROM graft.t_null WHERE id IS NULL")
      .as[Long].head() === 0L)
    assert(sql("SELECT count(*) FROM graft.t_null").as[Long].head() === 2L)
  }

  test("column DEFAULT values: CREATE-time, INSERT substitution, SET/DROP DEFAULT") {
    fsDel(s"$wh/t_dflt")
    sql("CREATE TABLE graft.t_dflt " +
      "(id BIGINT, n BIGINT DEFAULT 7, s STRING DEFAULT 'x')")
    // omitted columns and the DEFAULT keyword both substitute at
    // analysis time — the stored rows carry REAL values
    sql("INSERT INTO graft.t_dflt (id) VALUES (1)")
    sql("INSERT INTO graft.t_dflt VALUES (2, DEFAULT, DEFAULT)")
    sql("INSERT INTO graft.t_dflt VALUES (3, 30, 'y')")
    assert(sql("SELECT id, n, s FROM graft.t_dflt ORDER BY id")
      .as[(Long, Long, String)].collect().toSeq ===
      Seq((1L, 7L, "x"), (2L, 7L, "x"), (3L, 30L, "y")))
    // SET DEFAULT: metadata-only, affects FUTURE inserts only
    val files0 = ManifestTable.snapshot(spark, s"$wh/t_dflt").files.toSet
    sql("ALTER TABLE graft.t_dflt ALTER COLUMN n SET DEFAULT 9")
    assert(ManifestTable.snapshot(spark, s"$wh/t_dflt").files.toSet
      === files0, "SET DEFAULT must not move data")
    sql("INSERT INTO graft.t_dflt (id) VALUES (4)")
    assert(sql("SELECT n FROM graft.t_dflt WHERE id = 4").as[Long].head()
      === 9L)
    assert(sql("SELECT n FROM graft.t_dflt WHERE id = 1").as[Long].head()
      === 7L, "existing rows keep their written values")
    // DROP DEFAULT: omitted column goes back to NULL
    sql("ALTER TABLE graft.t_dflt ALTER COLUMN n DROP DEFAULT")
    sql("INSERT INTO graft.t_dflt (id) VALUES (5)")
    assert(sql("SELECT n FROM graft.t_dflt WHERE id = 5")
      .as[Option[Long]].collect() === Array(None))
  }

  test("ADD COLUMN ... DEFAULT: EXISTS_DEFAULT read-fill, the two-field protocol") {
    fsDel(s"$wh/t_adddf")
    sql("CREATE TABLE graft.t_adddf (id BIGINT)")
    sql("INSERT INTO graft.t_adddf VALUES (1), (2)")
    val files0 = ManifestTable.snapshot(spark, s"$wh/t_adddf").files.toSet
    // the ADD is METADATA-ONLY; pre-ADD files read the frozen default
    sql("ALTER TABLE graft.t_adddf ADD COLUMN z BIGINT DEFAULT 5")
    assert(ManifestTable.snapshot(spark, s"$wh/t_adddf").files.toSet
      === files0, "ADD COLUMN DEFAULT must not move data")
    assert(sql("SELECT id, z FROM graft.t_adddf ORDER BY id")
      .as[(Long, Long)].collect().toSeq === Seq((1L, 5L), (2L, 5L)),
      "pre-ADD rows must read the EXISTS default, not NULL")
    // a post-ADD file that stores an EXPLICIT NULL keeps it — the fill
    // is per-file-absence, never a coalesce
    sql("INSERT INTO graft.t_adddf VALUES (3, NULL), (4, 44)")
    assert(sql("SELECT id, z FROM graft.t_adddf ORDER BY id")
      .as[(Long, Option[Long])].collect().toSeq ===
      Seq((1L, Some(5L)), (2L, Some(5L)), (3L, None), (4L, Some(44L))))
    // an INSERT omitting the column takes CURRENT_DEFAULT (same value
    // until a SET DEFAULT)
    sql("INSERT INTO graft.t_adddf (id) VALUES (5)")
    assert(sql("SELECT z FROM graft.t_adddf WHERE id = 5")
      .as[Long].head() === 5L)
    // SET DEFAULT moves CURRENT only: new omissions take 9, the
    // pre-ADD rows KEEP reading 5 (EXISTS is frozen at the ADD)
    sql("ALTER TABLE graft.t_adddf ALTER COLUMN z SET DEFAULT 9")
    sql("INSERT INTO graft.t_adddf (id) VALUES (6)")
    assert(sql("SELECT z FROM graft.t_adddf WHERE id = 6")
      .as[Long].head() === 9L)
    assert(sql("SELECT z FROM graft.t_adddf WHERE id = 1")
      .as[Long].head() === 5L,
      "SET DEFAULT must not rewrite history — EXISTS stays frozen")
    // DROP DEFAULT: future omissions go NULL; the read-fill still holds
    sql("ALTER TABLE graft.t_adddf ALTER COLUMN z DROP DEFAULT")
    sql("INSERT INTO graft.t_adddf (id) VALUES (7)")
    assert(sql("SELECT z FROM graft.t_adddf WHERE id = 7")
      .as[Option[Long]].collect() === Array(None))
    assert(sql("SELECT z FROM graft.t_adddf WHERE id = 2")
      .as[Long].head() === 5L)
    // a REWRITE materializes the fill; the rewritten file then carries
    // real bytes (the pre-ADD set only shrinks)
    sql("UPDATE graft.t_adddf SET id = id + 10 WHERE id = 1")
    assert(sql("SELECT z FROM graft.t_adddf WHERE id = 11")
      .as[Long].head() === 5L)
    // DROP then re-ADD the name: a FRESH slot — the old default (and
    // the old bytes) must NOT resurrect; plain re-ADD null-fills
    sql("ALTER TABLE graft.t_adddf DROP COLUMN z")
    sql("ALTER TABLE graft.t_adddf ADD COLUMN z BIGINT")
    assert(sql("SELECT count(*) FROM graft.t_adddf WHERE z IS NOT NULL")
      .as[Long].head() === 0L,
      "a re-added column must not resurrect the dropped default")
    // and a re-ADD WITH a new default fills EVERY existing row with the
    // NEW value (they all predate the fresh slot)
    sql("ALTER TABLE graft.t_adddf DROP COLUMN z")
    sql("ALTER TABLE graft.t_adddf ADD COLUMN z BIGINT DEFAULT 77")
    assert(sql("SELECT count(*) FROM graft.t_adddf WHERE z = 77")
      .as[Long].head() ===
      sql("SELECT count(*) FROM graft.t_adddf").as[Long].head())
    // widening the defaulted column keeps the fill readable
    sql("ALTER TABLE graft.t_adddf ADD COLUMN w INT DEFAULT 3")
    sql("ALTER TABLE graft.t_adddf ALTER COLUMN w TYPE BIGINT")
    assert(sql("SELECT w FROM graft.t_adddf WHERE id = 2")
      .as[Long].head() === 3L)
  }

  test("GENERATED ALWAYS AS: compute on insert, validate explicit, recompute on update") {
    fsDel(s"$wh/t_gen")
    sql("CREATE TABLE graft.t_gen (id BIGINT, a BIGINT, " +
      "g BIGINT GENERATED ALWAYS AS (a * 2 + 1))")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // omitted and NULL slots compute; correct explicit values land
    sql("INSERT INTO graft.t_gen (id, a) VALUES (1, 10)")
    sql("INSERT INTO graft.t_gen VALUES (2, 5, 11)")
    sql("INSERT INTO graft.t_gen VALUES (3, 7, NULL)")
    assert(sql("SELECT id, g FROM graft.t_gen ORDER BY id")
      .as[(Long, Long)].collect().toSeq ===
      Seq((1L, 21L), (2L, 11L), (3L, 15L)))
    // an explicit WRONG value is a loud check failure, never silently
    // corrected
    val bad = intercept[Exception] {
      sql("INSERT INTO graft.t_gen VALUES (4, 5, 99)")
    }
    assert(msgs(bad).exists(_.contains("graft.generated.g")),
      msgs(bad).mkString(" | "))
    // UPDATE recomputes from the changed source column...
    sql("UPDATE graft.t_gen SET a = 20 WHERE id = 1")
    assert(sql("SELECT g FROM graft.t_gen WHERE id = 1")
      .as[Long].head() === 41L)
    // ...and assigning the generated column itself is a loud no
    val setG = intercept[Exception] {
      sql("UPDATE graft.t_gen SET g = 5 WHERE id = 1")
    }
    assert(msgs(setG).exists(_.contains("GENERATED ALWAYS AS")),
      msgs(setG).mkString(" | "))
    // MERGE: matched updates recompute, unmatched partial inserts
    // compute, SET g rejects
    Seq((1L, 100L), (9L, 9L)).toDF("k", "v")
      .createOrReplaceTempView("t_gen_src")
    sql("""MERGE INTO graft.t_gen t USING t_gen_src s ON t.id = s.k
          |WHEN MATCHED THEN UPDATE SET a = s.v
          |WHEN NOT MATCHED THEN INSERT (id, a) VALUES (s.k, s.v)""".stripMargin)
    assert(sql("SELECT id, g FROM graft.t_gen ORDER BY id")
      .as[(Long, Long)].collect().toSeq ===
      Seq((1L, 201L), (2L, 11L), (3L, 15L), (9L, 19L)))
    val mergeG = intercept[Exception] {
      sql("""MERGE INTO graft.t_gen t USING t_gen_src s ON t.id = s.k
            |WHEN MATCHED THEN UPDATE SET g = s.v""".stripMargin)
    }
    assert(msgs(mergeG).exists(_.contains("GENERATED ALWAYS AS")),
      msgs(mergeG).mkString(" | "))
    // the merge-on-read update path recomputes too
    ManifestTable.updateWhereDV(spark, s"$wh/t_gen", "id = 2",
      Map("a" -> "a + 1"), "gen-dv-upd")
    assert(sql("SELECT g FROM graft.t_gen WHERE id = 2")
      .as[Long].head() === 13L)
    // full-row Scala merge computes the omitted generated column
    ManifestTable.merge(Seq((20L, 3L)).toDF("id", "a"), s"$wh/t_gen",
      Seq("id"), "gen-merge")
    assert(sql("SELECT g FROM graft.t_gen WHERE id = 20")
      .as[Long].head() === 7L)
  }

  test("GENERATED AS IDENTITY: unique minting, versioned mark, ALWAYS vs BY DEFAULT") {
    fsDel(s"$wh/t_idn")
    fsDel(s"$wh/t_idn2")
    sql("CREATE TABLE graft.t_idn (id BIGINT GENERATED ALWAYS AS " +
      "IDENTITY (START WITH 10 INCREMENT BY 2), v STRING)")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    sql("INSERT INTO graft.t_idn (v) VALUES ('a'), ('b'), ('c')")
    val first = sql("SELECT id FROM graft.t_idn").as[Long].collect().toSet
    assert(first === Set(10L, 12L, 14L),
      "first batch must mint the declared start/step range")
    sql("INSERT INTO graft.t_idn (v) VALUES ('d'), ('e')")
    val second = sql("SELECT id FROM graft.t_idn").as[Long]
      .collect().toSet -- first
    assert(second.size === 2 && second.forall(_ >= 16L),
      s"second batch must mint past the mark, got $second")
    // ALWAYS refuses explicit values, and the column is unassignable
    val exp = intercept[Exception] {
      sql("INSERT INTO graft.t_idn VALUES (999, 'x')")
    }
    assert(msgs(exp).exists(_.contains("GENERATED ALWAYS AS IDENTITY")),
      msgs(exp).mkString(" | "))
    val upd = intercept[Exception] {
      sql("UPDATE graft.t_idn SET id = 1 WHERE v = 'a'")
    }
    assert(msgs(upd).exists(_.contains("IDENTITY")), msgs(upd).mkString(" | "))
    // MERGE cannot mint: loud, naming the append path
    spark.range(1).selectExpr("'z' AS v").createOrReplaceTempView("idn_src")
    val mrg = intercept[Exception] {
      sql("""MERGE INTO graft.t_idn t USING idn_src s ON t.v = s.v
            |WHEN NOT MATCHED THEN INSERT (v) VALUES (s.v)""".stripMargin)
    }
    assert(msgs(mrg).exists(_.contains("append/INSERT")),
      msgs(mrg).mkString(" | "))
    // BY DEFAULT: explicit values land, the mark clears them, minted
    // values never collide
    sql("CREATE TABLE graft.t_idn2 (id BIGINT GENERATED BY DEFAULT AS " +
      "IDENTITY, v STRING)")
    sql("INSERT INTO graft.t_idn2 VALUES (100, 'x')")
    sql("INSERT INTO graft.t_idn2 (v) VALUES ('y')")
    val ids2 = sql("SELECT id FROM graft.t_idn2").as[Long].collect().toSeq
    assert(ids2.size === 2 && ids2.distinct.size === 2 &&
      ids2.contains(100L) && ids2.exists(_ > 100L),
      s"BY DEFAULT minting must clear explicit values, got $ids2")
    // racing appends can never mint overlapping ranges: a competing
    // append lands BETWEEN this one's staging and its commit (the
    // beforeCommit hook) — the commit refuses on the moved mark and
    // the retry restages against the fresh one
    import spark.implicits._
    val dir2 = s"$wh/t_idn2"
    ManifestTable.append(Seq(("r1"), ("r2")).toDF("v"), dir2, "race-outer",
      beforeCommit = () =>
        ManifestTable.append(Seq(("i1"), ("i2")).toDF("v"), dir2,
          "race-inner"): Unit)
    val all = sql("SELECT id FROM graft.t_idn2").as[Long].collect().toSeq
    assert(all.size === 6 && all.distinct.size === 6,
      s"racing appends minted overlapping ids: $all")
    // RENAME cannot orphan the mark (it is keyed physically, like
    // every stat): minting continues, never re-mints from the start
    sql("ALTER TABLE graft.t_idn2 RENAME COLUMN id TO row_id")
    sql("INSERT INTO graft.t_idn2 (v) VALUES ('post-rename')")
    val all2 = sql("SELECT row_id FROM graft.t_idn2").as[Long]
      .collect().toSeq
    assert(all2.size === 7 && all2.distinct.size === 7,
      s"post-rename mint re-used a published id: $all2")
    assert(all2.max > all.max,
      "post-rename mint must continue from the mark, not the start")
    // RESTORE keeps the mark (monotonic forever): minting after a
    // rewind can never re-issue an id a travelable version carries
    val vNow = ManifestTable.headVersion(spark, dir2)
    sql("INSERT INTO graft.t_idn2 (v) VALUES ('doomed')")
    val peak = sql("SELECT max(row_id) FROM graft.t_idn2").as[Long].head()
    ManifestTable.restore(spark, dir2, vNow, "idn-restore")
    sql("INSERT INTO graft.t_idn2 (v) VALUES ('post-restore')")
    val post = sql("SELECT max(row_id) FROM graft.t_idn2").as[Long].head()
    assert(post > peak,
      s"post-restore mint ($post) must clear the pre-restore peak " +
        s"($peak) — the mark never rewinds")
  }

  test("generated-column derived pruning: a WHERE on the source column prunes the generated partitions") {
    fsDel(s"$wh/t_gpp")
    sql("CREATE TABLE graft.t_gpp (id BIGINT, ts TIMESTAMP, n BIGINT, " +
      "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) " +
      "PARTITIONED BY (day)")
    // 8 days x 6 rows in ONE insert — the partitioned write splits one
    // file per day, day computed by fillGenerated (never supplied)
    sql("INSERT INTO graft.t_gpp (id, ts, n) SELECT id, " +
      "TIMESTAMP'2024-03-01 00:00:00' + " +
      "make_interval(0, 0, 0, 0, CAST(id * 4 AS INT)), id FROM range(48)")
    val dir = s"$wh/t_gpp"
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.files.size >= 8,
      s"expected >= 8 day-partition files, got ${snap.files.size}")
    // MECHANISM: the derivation itself — a ts range conjunct gains a
    // day bound (monotone CAST-to-date), a ts equality gains a day
    // equality, and a NON-monotone generation (id % 7) derives from
    // equality only
    val aug = ManifestTable.withGeneratedDerived(spark, snap,
      spark.sessionState.sqlParser.parseExpression(
        "ts >= TIMESTAMP'2024-03-03 00:00:00'"))
    assert(aug.sql.contains("day") && aug.sql.contains("2024-03-03"),
      s"ts range must derive a day bound, got: ${aug.sql}")
    fsDel(s"$wh/t_gppm")
    sql("CREATE TABLE graft.t_gppm (id BIGINT, " +
      "m BIGINT GENERATED ALWAYS AS (id % 7))")
    sql("INSERT INTO graft.t_gppm (id) SELECT id FROM range(10)")
    val msnap = ManifestTable.snapshot(spark, s"$wh/t_gppm")
    val maugEq = ManifestTable.withGeneratedDerived(spark, msnap,
      spark.sessionState.sqlParser.parseExpression("id = 9"))
    assert(maugEq.sql.contains("m") && maugEq.sql.contains("= 2") ||
      maugEq.sql.contains("2 ="),
      s"id = 9 must derive m = 2, got: ${maugEq.sql}")
    val maugRange = ManifestTable.withGeneratedDerived(spark, msnap,
      spark.sessionState.sqlParser.parseExpression("id > 5"))
    assert(maugRange.sql ==
      spark.sessionState.sqlParser.parseExpression("id > 5").sql,
      s"a range over a NON-monotone generation must not derive, " +
        s"got: ${maugRange.sql}")
    // SCAN: a predicate on ts ALONE reads only the bounded day files
    val probe = sql("SELECT id, n FROM graft.t_gpp " +
      "WHERE ts >= TIMESTAMP'2024-03-03 00:00:00' " +
      "AND ts < TIMESTAMP'2024-03-05 00:00:00'")
    probe.collect()
    val read = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }
    assert(read.nonEmpty && read.sum <= 3,
      s"ts-range probe read ${read.sum} of ${snap.files.size} files — " +
        "the derived day bound did not prune")
    // ROW OPS: a DELETE by ts range rewrites only the bounded day files
    sql("DELETE FROM graft.t_gpp " +
      "WHERE ts >= TIMESTAMP'2024-03-07 00:00:00'")
    val after = ManifestTable.snapshot(spark, dir)
    val rewritten = snap.files.toSet.diff(after.files.toSet).size
    assert(rewritten <= 3,
      s"ts-range DELETE rewrote $rewritten of ${snap.files.size} files")
    assert(sql("SELECT count(*) FROM graft.t_gpp").as[Long].head() === 36L)
  }

  test("identity mark never rewinds on a behind-the-mark explicit backfill") {
    fsDel(s"$wh/t_idn3")
    sql("CREATE TABLE graft.t_idn3 (id BIGINT GENERATED BY DEFAULT AS " +
      "IDENTITY, v STRING)")
    sql("INSERT INTO graft.t_idn3 (v) " +
      "SELECT CAST(id AS STRING) FROM range(100)")
    val dir = s"$wh/t_idn3"
    val mark0 = ManifestTable.snapshot(spark, dir)
      .properties("graft.identity.hwm.id").toLong
    assert(mark0 === 101L,
      s"100 minted rows from start 1 must leave the mark at 101, got $mark0")
    // the backfill: an explicit value far BEHIND the mark — the staged
    // footer max (5) plus step would REWIND the mark without the clamp,
    // and the next mint would re-issue already-published ids
    sql("INSERT INTO graft.t_idn3 VALUES (5, 'backfill')")
    val mark1 = ManifestTable.snapshot(spark, dir)
      .properties("graft.identity.hwm.id").toLong
    assert(mark1 === mark0,
      s"a behind-the-mark explicit value moved the mark $mark0 -> $mark1")
    sql("INSERT INTO graft.t_idn3 (v) VALUES ('after')")
    val ids = sql("SELECT id FROM graft.t_idn3").as[Long].collect().toSeq
    assert(ids.count(_ === 101L) === 1 && ids.max === 101L,
      s"the post-backfill mint must continue at 101, got max ${ids.max}")
    // a NEGATIVE step clamps the other way: explicit value ABOVE the
    // (descending) mark must not raise it back up
    fsDel(s"$wh/t_idn4")
    sql("CREATE TABLE graft.t_idn4 (id BIGINT GENERATED BY DEFAULT AS " +
      "IDENTITY (START WITH 0 INCREMENT BY -1), v STRING)")
    sql("INSERT INTO graft.t_idn4 (v) SELECT CAST(id AS STRING) FROM range(10)")
    val dmark0 = ManifestTable.snapshot(spark, s"$wh/t_idn4")
      .properties("graft.identity.hwm.id").toLong
    assert(dmark0 === -10L, s"descending mark after 0..-9 must be -10, got $dmark0")
    sql("INSERT INTO graft.t_idn4 VALUES (-3, 'backfill')")
    val dmark1 = ManifestTable.snapshot(spark, s"$wh/t_idn4")
      .properties("graft.identity.hwm.id").toLong
    assert(dmark1 === dmark0,
      s"an above-the-mark explicit value moved the descending mark " +
        s"$dmark0 -> $dmark1")
  }

  test("rename/drop of a generation-expression source column is a loud no") {
    fsDel(s"$wh/t_genref")
    sql("CREATE TABLE graft.t_genref (id BIGINT, a BIGINT, " +
      "g BIGINT GENERATED ALWAYS AS (a + 1))")
    sql("INSERT INTO graft.t_genref (id, a) VALUES (1, 10)")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ren = intercept[Exception] {
      sql("ALTER TABLE graft.t_genref RENAME COLUMN a TO b")
    }
    assert(msgs(ren).exists(_.contains("compute from it")),
      msgs(ren).mkString(" | "))
    val drp = intercept[Exception] {
      sql("ALTER TABLE graft.t_genref DROP COLUMN a")
    }
    assert(msgs(drp).exists(_.contains("compute from it")),
      msgs(drp).mkString(" | "))
    // dropping the GENERATED column itself releases the dependency
    sql("ALTER TABLE graft.t_genref DROP COLUMN g")
    sql("ALTER TABLE graft.t_genref RENAME COLUMN a TO b")
    assert(sql("SELECT b FROM graft.t_genref").as[Long].head() === 10L)
  }

  test("SQL CHECK constraints: ADD validates existing rows, appends enforce, DROP releases") {
    fsDel(s"$wh/t_ck")
    sql("CREATE TABLE graft.t_ck (id BIGINT, n BIGINT)")
    sql("INSERT INTO graft.t_ck VALUES (1, 10), (2, 20)")
    // ADD over clean data lands (one validation aggregate)
    sql("ALTER TABLE graft.t_ck ADD CONSTRAINT n_pos CHECK (n > 0)")
    assert(ManifestTable.snapshot(spark, s"$wh/t_ck")
      .constraints.get("n_pos").exists(_.contains("n")))
    // a violating INSERT is refused by the append-side enforcement
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val bad = intercept[Exception] {
      sql("INSERT INTO graft.t_ck VALUES (3, -1)")
    }
    assert(msgs(bad).exists(_.contains("n_pos")), msgs(bad).mkString(" | "))
    assert(sql("SELECT count(*) FROM graft.t_ck").as[Long].head() === 2L)
    // ADD over violating data is refused with the count
    val bad2 = intercept[Exception] {
      sql("ALTER TABLE graft.t_ck ADD CONSTRAINT n_small CHECK (n < 15)")
    }
    assert(msgs(bad2).exists(_.contains("violate")), msgs(bad2).mkString(" | "))
    // DROP releases; unknown names raise unless IF EXISTS
    sql("ALTER TABLE graft.t_ck DROP CONSTRAINT n_pos")
    sql("INSERT INTO graft.t_ck VALUES (3, -1)")
    assert(sql("SELECT count(*) FROM graft.t_ck").as[Long].head() === 3L)
    val bad3 = intercept[Exception] {
      sql("ALTER TABLE graft.t_ck DROP CONSTRAINT nope")
    }
    assert(msgs(bad3).exists(_.toLowerCase.contains("constraint")),
      msgs(bad3).mkString(" | "))
    sql("ALTER TABLE graft.t_ck DROP CONSTRAINT IF EXISTS nope") // no-op
  }

  test("inline CHECK at CREATE TABLE records and enforces; staged paths refuse loudly") {
    fsDel(s"$wh/t_ckc")
    sql("CREATE TABLE graft.t_ckc " +
      "(id BIGINT, n BIGINT, CONSTRAINT n_pos CHECK (n > 0))")
    assert(ManifestTable.snapshot(spark, s"$wh/t_ckc")
      .constraints === Map("n_pos" -> "n > 0"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // enforced from row one — both Spark's write-side check (the table
    // surfaces the constraint on its V2 face) and the manifest append
    // pass stand behind it
    val bad = intercept[Exception] {
      sql("INSERT INTO graft.t_ckc VALUES (1, -5)")
    }
    assert(msgs(bad).exists(_.contains("n_pos")), msgs(bad).mkString(" | "))
    sql("INSERT INTO graft.t_ckc VALUES (1, 5)")
    assert(sql("SELECT count(*) FROM graft.t_ckc").as[Long].head() === 1L)
    // the staged paths (CTAS/REPLACE) cannot honor inline constraints
    // atomically — Spark's own parser refuses first (and the catalog's
    // stage* overrides guard the same hole as defense-in-depth)
    fsDel(s"$wh/t_ckc2")
    val staged = intercept[Exception] {
      sql("CREATE TABLE graft.t_ckc2 (CONSTRAINT n_pos CHECK (n > 0)) " +
        "AS SELECT id, n FROM graft.t_ckc")
    }
    assert(msgs(staged).exists(m => m.contains("Constraints") ||
      m.contains("ADD CONSTRAINT")), msgs(staged).mkString(" | "))
  }

  test("ALTER COLUMN COMMENT: field-metadata commit, DESCRIBE surfaces it") {
    fsDel(s"$wh/t_cmnt")
    sql("CREATE TABLE graft.t_cmnt (id BIGINT, v STRING)")
    sql("INSERT INTO graft.t_cmnt VALUES (1, 'a')")
    val files0 = ManifestTable.snapshot(spark, s"$wh/t_cmnt").files.toSet
    sql("ALTER TABLE graft.t_cmnt ALTER COLUMN v COMMENT 'the payload'")
    assert(ManifestTable.snapshot(spark, s"$wh/t_cmnt").files.toSet
      === files0, "COMMENT must not move data")
    val desc = sql("DESCRIBE TABLE graft.t_cmnt")
      .as[(String, String, String)].collect()
      .map { case (k, _, c) => k -> c }.toMap
    assert(desc.get("v").contains("the payload"), desc.toString)
    // reads and writes are untouched by the metadata commit
    sql("INSERT INTO graft.t_cmnt VALUES (2, 'b')")
    assert(sql("SELECT count(*) FROM graft.t_cmnt").as[Long].head() === 2L)
  }
}
