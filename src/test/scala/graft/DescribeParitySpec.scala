package graft

import org.apache.spark.sql.DataFrame
import graft.ext.ManifestTable

/** PARITY SWEEP over the observability faces (VERDICT r18 stretch #8):
  * every metadata/mutation verb the engine grew in r18-r19 — column
  * DEFAULTs (including `ADD COLUMN ... DEFAULT`'s EXISTS read-fill),
  * CHECK constraints, nullability, comments, struct columns, the
  * correlated-DML commits — must surface truthfully in
  * [[ManifestTable.history]], [[ManifestTable.detail]] and the SQL
  * DESCRIBE face. The cheap regression net for a metadata surface
  * that grew fast: a verb whose commit is mislabeled (or invisible)
  * here is a verb operators cannot audit on a 100 TB table.
  */
class DescribeParitySpec extends SparkSpec {
  import spark.implicits._

  private val wh = "/tmp/graft_test/dparity_wh"
  private val dir = s"$wh/t_par"

  private def sql(q: String): DataFrame = spark.sql(q)

  override def withFixture(test: NoArgTest) = {
    spark.conf.set("spark.sql.catalog.graft_par", "graft.ext.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_par.warehouse", wh)
    super.withFixture(test)
  }

  test("every r18/r19 mutation verb lands with the right op label and detail counters") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(wh), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)

    // the timeline: each step records (expected op, description)
    sql("CREATE TABLE graft_par.t_par " +                    // v1 create
      "(id BIGINT, n BIGINT DEFAULT 7, m STRUCT<a: BIGINT, b: STRING>)")
    sql("INSERT INTO graft_par.t_par VALUES " +              // v2 append
      "(1, 1, named_struct('a', 10L, 'b', 'x')), " +
      "(2, 2, named_struct('a', 20L, 'b', 'y'))")
    sql("ALTER TABLE graft_par.t_par ADD COLUMN z BIGINT DEFAULT 5") // v3
    sql("ALTER TABLE graft_par.t_par ALTER COLUMN z SET DEFAULT 9")  // v4
    sql("ALTER TABLE graft_par.t_par " +                     // v5
      "ADD CONSTRAINT n_pos CHECK (n >= 0)")
    sql("ALTER TABLE graft_par.t_par ALTER COLUMN n SET NOT NULL")   // v6
    sql("ALTER TABLE graft_par.t_par ALTER COLUMN n " +      // v7
      "COMMENT 'bounded count'")
    sql("UPDATE graft_par.t_par SET m.a = m.a + 1 WHERE id = 1")     // v8
    Seq((2L, 22L)).toDF("k", "v").createOrReplaceTempView("par_src")
    sql("DELETE FROM graft_par.t_par t WHERE EXISTS " +      // v9
      "(SELECT 1 FROM par_src s WHERE s.k = t.id)")
    sql("ALTER TABLE graft_par.t_par ALTER COLUMN n DROP NOT NULL")  // v10
    sql("ALTER TABLE graft_par.t_par DROP CONSTRAINT n_pos")         // v11

    val hist = ManifestTable.history(spark, dir)
      .orderBy("version")
      .as[(Long, String, Int, Int, Option[Long], Boolean)]
      .collect().toSeq
    val ops = hist.map(h => h._1 -> h._2).toMap
    assert(ops(1L) === "create")
    assert(ops(2L) === "append")
    // every pure-DDL verb is a `metadata` commit: the feeds skip them
    Seq(3L, 4L, 5L, 6L, 7L, 10L, 11L).foreach(v =>
      assert(ops(v) === "metadata",
        s"v$v landed as '${ops(v)}', expected metadata"))
    assert(ops(8L) === "update", "struct-field UPDATE must label update")
    assert(ops(9L) === "delete",
      "correlated-EXISTS DELETE (semi, no residual) must label delete")
    // rows_known tracks the mutations: 2 after append, 1 after the
    // delete; the metadata commits never change it
    assert(hist.find(_._1 == 2L).get._5 === Some(2L))
    assert(hist.find(_._1 == 9L).get._5 === Some(1L))
    assert(hist.find(_._1 == 7L).get._5 === Some(2L))

    // DETAIL: the one-row operational summary agrees with the head
    val det = ManifestTable.detail(spark, dir).collect()(0)
    assert(det.getAs[Long]("version") === 11L)
    assert(det.getAs[Long]("n_constraints") === 0L,
      "DROP CONSTRAINT must surface in detail")
    assert(det.getAs[Boolean]("has_schema"))
    assert(det.getAs[Long]("rows_known") === 1L)
    // re-add the constraint: the counter must move 0 -> 1
    sql("ALTER TABLE graft_par.t_par ADD CONSTRAINT z_pos CHECK (z >= 0)")
    assert(ManifestTable.detail(spark, dir).collect()(0)
      .getAs[Long]("n_constraints") === 1L)

    // DESCRIBE face: comment and struct type surface; defaults ride
    // the schema metadata (CURRENT moved to 9, EXISTS frozen at 5)
    val desc = sql("DESCRIBE TABLE graft_par.t_par")
      .as[(String, String, String)].collect().toSeq
    assert(desc.exists(r => r._1 == "n" && r._3 == "bounded count"))
    assert(desc.exists(r => r._1 == "m" && r._2.startsWith("struct<")))
    val zField = spark.table("graft_par.t_par").schema("z")
    assert(zField.metadata.getString("CURRENT_DEFAULT") === "9")
    // the EXISTS default is the FROZEN literal's SQL spelling ("5L")
    assert(spark.sessionState.sqlParser.parseExpression(
      zField.metadata.getString("EXISTS_DEFAULT"))
      .eval(null) === 5L)
    // nullability round-trip: SET NOT NULL then DROP NOT NULL ends
    // nullable
    assert(spark.table("graft_par.t_par").schema("n").nullable)

    // and the data story the faces describe is true: row 2 went, row
    // 1 carries the struct bump and the frozen fill
    assert(sql("SELECT id, m.a, z FROM graft_par.t_par ORDER BY id")
      .as[(Long, Long, Long)].collect().toSeq === Seq((1L, 11L, 5L)))
  }
}
