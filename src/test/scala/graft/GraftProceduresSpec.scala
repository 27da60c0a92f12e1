package graft

import org.apache.spark.sql.DataFrame
import graft.ext.ManifestTable

/** The SQL maintenance face: `CALL graft_proc.system.<proc>(...)` stored
  * procedures ([[graft.ext.GraftProcedures]]) — each a veneer over the
  * corresponding maintenance method, returning its observable result
  * as a one-row relation.
  */
class GraftProceduresSpec extends SparkSpec {
  import spark.implicits._

  private val wh = "/tmp/graft_test/gproc_wh"

  private def sql(q: String): DataFrame = spark.sql(q)

  override def withFixture(test: NoArgTest) = {
    spark.conf.set("spark.sql.catalog.graft_proc", "graft.ext.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_proc.warehouse", wh)
    super.withFixture(test)
  }

  private def fsDel(path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
  }

  test("compact_small packs only under-sized files and reports the rewrite") {
    fsDel(s"$wh/p_pack")
    val docs = (0L until 2000L)
      .map(i => (i, s"document body $i with ballast")).toDF("id", "text")
    ManifestTable.append(docs, s"$wh/p_pack", "b0")
    ManifestTable.compact(spark, s"$wh/p_pack",
      targetFileBytes = 4L * 1024, clusterBy = Seq("id"))
    val before = ManifestTable.snapshot(spark, s"$wh/p_pack").files.size
    require(before > 3, s"degenerate: $before files")
    val res = sql("CALL graft_proc.system.compact_small(table => 'p_pack', " +
      "target_file_bytes => 134217728, min_file_bytes => 67108864)")
      .as[(Int, Int)].head()
    assert(res._1 === before, "every 4KB file is under-sized: all pack")
    assert(res._2 < before, "packing must reduce the file count")
    assert(ManifestTable.snapshot(spark, s"$wh/p_pack").files.size === res._2)
    assert(ManifestTable.read(spark, s"$wh/p_pack").count() === 2000L)
  }

  test("checkpoint + expire_log + vacuum via CALL: bounded log, bounded disk") {
    fsDel(s"$wh/p_life")
    (1 to 6).foreach(i => ManifestTable.append(
      Seq((i.toLong, s"v$i")).toDF("id", "v"), s"$wh/p_life", s"b$i"))
    val v = sql("CALL graft_proc.system.checkpoint(table => 'p_life')")
      .as[Long].head()
    assert(v === 6L)
    // the checkpoint sits at head, so retain 0 anchors expiry on it
    val expired = sql("CALL graft_proc.system.expire_log(" +
      "table => 'p_life', retain_versions => 0)").as[Int].head()
    assert(expired > 0, "a 6-commit log with a head checkpoint and " +
      "retain 0 must expire entries")
    // a full rewrite orphans the old files; zero-grace vacuum collects
    ManifestTable.compact(spark, s"$wh/p_life", targetFileBytes = 1L << 30)
    val deleted = sql("CALL graft_proc.system.vacuum(" +
      "table => 'p_life', grace_seconds => 0)").as[Int].head()
    assert(deleted > 0, "vacuum after a full rewrite must delete files")
    assert(ManifestTable.read(spark, s"$wh/p_life").count() === 6L)
  }

  test("purge_deletes via CALL rewrites only threshold-crossed files") {
    fsDel(s"$wh/p_purge")
    val docs = (0L until 2000L)
      .map(i => (i, s"doc $i with some ballast text to split the files"))
      .toDF("id", "text")
    ManifestTable.append(docs, s"$wh/p_purge", "b0")
    ManifestTable.compact(spark, s"$wh/p_purge",
      targetFileBytes = 4L * 1024, clusterBy = Seq("id"))
    val s0 = ManifestTable.snapshot(spark, s"$wh/p_purge")
    val total = s0.files.size
    require(total > 3, s"degenerate: $total files")
    // derive the band from the ACTUAL file ranges (file sizing is
    // byte/compression-dependent): cover file 0 fully (metadata drop)
    // and ~40% of file 1 — a DV that crosses the 0.3 purge threshold
    val ranges = s0.files.map { f =>
      val c = s0.stats(f).cols("id")
      (c.min.get.toLong, c.max.get.toLong)
    }.sortBy(_._1)
    val cut = ranges(1)._1 + ((ranges(1)._2 - ranges(1)._1 + 1) * 2) / 5
    assert(ManifestTable.deleteWhereDV(spark, s"$wh/p_purge",
      s"id >= 0 AND id < $cut", "d0"))
    val res = sql("CALL graft_proc.system.purge_deletes(table => 'p_purge')")
      .as[(Int, Int)].head()
    assert(res._1 > 0 && res._1 < total,
      s"purge rewrote ${res._1} of $total files — expected a strict subset")
    // the only DV'd files were the crossed ones — purge retires them all
    val after = ManifestTable.snapshot(spark, s"$wh/p_purge")
    assert(after.files.forall(f => after.dvs.get(f).forall(_.isEmpty)),
      "purge left deletion vectors on rewritten files")
    assert(ManifestTable.read(spark, s"$wh/p_purge").count() === 2000L - cut)
  }

  test("restore via CALL rewinds and reports the new head") {
    fsDel(s"$wh/p_rest")
    ManifestTable.append(Seq((1L, "a")).toDF("id", "v"), s"$wh/p_rest", "b1")
    ManifestTable.append(Seq((2L, "b")).toDF("id", "v"), s"$wh/p_rest", "b2")
    assert(ManifestTable.deleteWhere(spark, s"$wh/p_rest", "id = 1", "d0"))
    assert(ManifestTable.read(spark, s"$wh/p_rest").count() === 1L)
    val (restored, head) = sql("CALL graft_proc.system.restore(" +
      "table => 'p_rest', version => 2)").as[(Boolean, Long)].head()
    assert(restored)
    assert(head > 2L, "restore commits a NEW version, never rewinds the log")
    assert(ManifestTable.read(spark, s"$wh/p_rest").count() === 2L)
  }

  test("full compact via CALL honors cluster_by and reports the rewrite") {
    fsDel(s"$wh/p_full")
    val docs = (0L until 1000L)
      .map(i => (i % 977 * 31 % 997, s"doc $i")).toDF("id", "text")
    ManifestTable.append(docs, s"$wh/p_full", "b0")
    val (rewritten, written) = sql("CALL graft_proc.system.compact(" +
      "table => 'p_full', target_file_bytes => 4096, cluster_by => 'id')")
      .as[(Int, Int)].head()
    assert(rewritten >= 1 && written > 1,
      s"compact reported $rewritten -> $written files")
    // clustered: a band predicate prunes on the manifest stats
    val (kept, tot) =
      ManifestTable.pruneInfo(spark, s"$wh/p_full", "id >= 0 AND id < 50")
    assert(kept < tot, s"clustered compaction did not yield pruning " +
      s"($kept of $tot)")
    assert(ManifestTable.read(spark, s"$wh/p_full").count() === 1000L)
  }

  test("tags: VERSION AS OF '<tag>' resolves, expiry + vacuum keep it live") {
    fsDel(s"$wh/p_tag")
    (1 to 3).foreach(i => ManifestTable.append(
      (0L until 50L).map(k => (i * 1000L + k, s"row $i/$k"))
        .toDF("id", "v"), s"$wh/p_tag", s"b$i"))
    val tagged = sql("CALL graft_proc.system.create_tag(" +
      "table => 'p_tag', tag => 'release-1')").as[(String, Long)].head()
    assert(tagged === ("release-1", 3L))
    // more commits + a full rewrite, then aggressive retention
    ManifestTable.append(Seq((9000L, "later")).toDF("id", "v"),
      s"$wh/p_tag", "b4")
    sql("CALL graft_proc.system.compact(table => 'p_tag', " +
      "target_file_bytes => 134217728)")
    sql("CALL graft_proc.system.checkpoint(table => 'p_tag')")
    sql("CALL graft_proc.system.expire_log(" +
      "table => 'p_tag', retain_versions => 0)")
    sql("CALL graft_proc.system.vacuum(" +
      "table => 'p_tag', grace_seconds => 0)")
    // the tagged snapshot is STILL resolvable and byte-correct: the
    // expiry floor held at the tag and vacuum kept its data files
    val atTag = sql(
      "SELECT count(*) FROM graft_proc.p_tag VERSION AS OF 'release-1'")
      .as[Long].head()
    assert(atTag === 150L)
    assert(sql("SELECT count(*) FROM graft_proc.p_tag").as[Long].head()
      === 151L)
    // a duplicate tag to another version is loud; dropping re-enters
    // retention
    val e = intercept[Exception](sql("CALL graft_proc.system.create_tag(" +
      "table => 'p_tag', tag => 'release-1', version => 4)"))
    assert(e.getMessage.contains("release-1"))
    assert(sql("CALL graft_proc.system.drop_tag(" +
      "table => 'p_tag', tag => 'release-1')").as[Boolean].head())
    val e2 = intercept[Exception](sql(
      "SELECT * FROM graft_proc.p_tag VERSION AS OF 'release-1'"))
    assert(e2.getMessage.contains("release-1"))
  }

  test("add_constraint/drop_constraint via CALL: enforced on the write path") {
    fsDel(s"$wh/p_cons")
    ManifestTable.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "n"),
      s"$wh/p_cons", "b0")
    assert(sql("CALL graft_proc.system.add_constraint(" +
      "table => 'p_cons', name => 'n_pos', expr => 'n > 0')")
      .as[Boolean].head())
    // violating batch refused by the same append-path enforcement
    val e = intercept[Exception](ManifestTable.append(
      Seq((3L, -5L)).toDF("id", "n"), s"$wh/p_cons", "b1"))
    assert(e.getMessage.contains("n_pos"))
    // a constraint existing rows violate cannot be added
    val e2 = intercept[Exception](sql(
      "CALL graft_proc.system.add_constraint(" +
        "table => 'p_cons', name => 'n_big', expr => 'n > 15')"))
    assert(e2.getMessage.contains("n_big"))
    assert(sql("CALL graft_proc.system.drop_constraint(" +
      "table => 'p_cons', name => 'n_pos')").as[Boolean].head())
    ManifestTable.append(Seq((3L, -5L)).toDF("id", "n"), s"$wh/p_cons", "b2")
    assert(ManifestTable.read(spark, s"$wh/p_cons").count() === 3L)
  }

  test("SHOW PROCEDURES lists the system namespace; unknown CALL is loud") {
    val listed = sql("SHOW PROCEDURES IN graft_proc")
      .select("procedure_name").as[String].collect().toSet
    assert(graft.ext.GraftProcedures.names.toSet.subsetOf(listed),
      s"missing procedures: ${graft.ext.GraftProcedures.names.toSet -- listed}")
    val e = intercept[Exception] {
      sql("CALL graft_proc.system.no_such_proc(table => 't')")
    }
    assert(e.getMessage.contains("no_such_proc"))
    val e2 = intercept[Exception] {
      sql("CALL graft_proc.system.vacuum(table => 'absent_table')")
    }
    assert(e2.getMessage.contains("absent_table"))
  }

  test("clone via CALL: zero data-file copies, shared reads, isolated writes, vacuum-safe") {
    fsDel(s"$wh/c_src")
    fsDel(s"$wh/c_dst")
    sql("CREATE TABLE graft_proc.c_src (id BIGINT, n BIGINT)")
    sql("INSERT INTO graft_proc.c_src SELECT id, id FROM range(0, 100)")
    sql("INSERT INTO graft_proc.c_src SELECT id, id FROM range(100, 200)")
    val srcSnap = ManifestTable.snapshot(spark, s"$wh/c_src")
    require(srcSnap.files.size >= 2, s"degenerate: ${srcSnap.files.size}")
    val v = sql("CALL graft_proc.system.clone(" +
      "source => 'c_src', target => 'c_dst')").as[Long].head()
    assert(v === 1L)
    // ZERO data files copied: the clone's data dir does not exist (or
    // is empty), yet the table reads the full source content
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(wh), spark.sparkContext.hadoopConfiguration)
    val dd = new org.apache.hadoop.fs.Path(s"$wh/c_dst/data")
    assert(!fs.exists(dd) || fs.listStatus(dd).isEmpty,
      "shallow clone must copy no data files")
    assert(sql("SELECT count(*), sum(n) FROM graft_proc.c_dst")
      .as[(Long, Long)].head() === ((200L, 19900L)))
    // stats travel: the clone prunes like the source
    val (kept, total) = ManifestTable.pruneInfo(spark, s"$wh/c_dst",
      "id >= 150")
    assert(total >= 2 && kept < total,
      s"clone must prune on the copied stats ($kept/$total)")
    // divergent write: the clone rewrites ONLY the absolute entries it
    // touches; the source never changes
    sql("UPDATE graft_proc.c_dst SET n = n + 1000 WHERE id >= 150")
    assert(sql("SELECT sum(n) FROM graft_proc.c_src").as[Long].head()
      === 19900L, "a clone write must never reach the source")
    assert(sql("SELECT sum(n) FROM graft_proc.c_dst").as[Long].head()
      === 69900L)
    val dstSnap = ManifestTable.snapshot(spark, s"$wh/c_dst")
    assert(dstSnap.files.exists(_.startsWith("/")) &&
      dstSnap.files.exists(!_.startsWith("/")),
      "COW must un-share exactly the touched files: " +
        dstSnap.files.mkString(", "))
    // vacuum of the clone must not delete source files it references
    sql("CALL graft_proc.system.vacuum(" +
      "table => 'c_dst', grace_seconds => 0)")
    assert(sql("SELECT count(*) FROM graft_proc.c_src").as[Long].head()
      === 200L, "clone vacuum must never touch the source's files")
    assert(sql("SELECT count(*) FROM graft_proc.c_dst").as[Long].head()
      === 200L)
    // a second clone into an existing table is loud
    val e = intercept[Exception] {
      sql("CALL graft_proc.system.clone(" +
        "source => 'c_src', target => 'c_dst')")
    }
    assert(e.getMessage.contains("already exists"))
  }
}
