package graft

/** The long tail of the SQL verb surface, pinned: verbs that need no
  * graft-specific code but MUST keep working against the catalog
  * (regressions here read as "the table format broke my tooling").
  * The heavyweight verbs have their own specs (GraftCatalogSpec,
  * GraftSqlDmlSpec, ColumnMappingSpec, ReplaceTableSpec,
  * GraftProceduresSpec).
  */
class SqlSurfaceSweepSpec extends SparkSpec {
  import spark.implicits._

  private val wh = "/tmp/graft_test/sweep_wh"

  override def withFixture(test: NoArgTest) = {
    spark.conf.set("spark.sql.catalog.graft_sw", "graft.ext.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_sw.warehouse", wh)
    super.withFixture(test)
  }

  test("TRUNCATE, SHOW CREATE, DESCRIBE, COMMENT, SHOW COLUMNS, CACHE, refresh") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(wh), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    spark.sql("CREATE TABLE graft_sw.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft_sw.t VALUES (1,'a'),(2,'b')")
    // TRUNCATE routes through SupportsDeleteV2's always-true delete —
    // a manifest commit, not a directory wipe (history survives)
    val vBefore = graft.ext.ManifestTable.headVersion(spark, s"$wh/t")
    spark.sql("TRUNCATE TABLE graft_sw.t")
    assert(spark.sql("SELECT count(*) FROM graft_sw.t").as[Long].head() === 0L)
    assert(graft.ext.ManifestTable.readVersion(spark, s"$wh/t", vBefore)
      .count() === 2L, "TRUNCATE must commit, not erase history")
    spark.sql("INSERT INTO graft_sw.t VALUES (3,'c')")
    // definitional verbs answer from catalog metadata
    val ddl = spark.sql("SHOW CREATE TABLE graft_sw.t")
      .collect().head.getString(0)
    assert(ddl.contains("graft-manifest") && ddl.contains("id BIGINT"), ddl)
    assert(spark.sql("DESCRIBE EXTENDED graft_sw.t").collect().nonEmpty)
    spark.sql("COMMENT ON TABLE graft_sw.t IS 'sweep'")
    assert(spark.sql("SHOW COLUMNS IN graft_sw.t")
      .as[String].collect().toSeq === Seq("id", "v"))
    // caching + invalidation round-trip (refreshTable crashed on bare
    // converted relations before GraftV2Reads stamped the CatalogTable)
    spark.sql("CACHE TABLE graft_sw.t")
    assert(spark.sql("SELECT count(*) FROM graft_sw.t").as[Long].head() === 1L)
    spark.sql("UNCACHE TABLE graft_sw.t")
    spark.catalog.refreshTable("graft_sw.t")
    // unconditional DELETE behaves like TRUNCATE (a commit)
    spark.sql("DELETE FROM graft_sw.t")
    assert(spark.sql("SELECT count(*) FROM graft_sw.t").as[Long].head() === 0L)
  }
}
