package graft

import org.apache.spark.sql.functions._
import graft.ext.ManifestTable

/** The generated-column TIMEZONE PIN (ADVICE r20 #4): generated values
  * like `CAST(ts AS DATE)` are computed with the writer's session
  * timezone, so (a) the table records the creating session's zone,
  * (b) a timezone-sensitive WRITE from a different session zone is a
  * loud refusal, and (c) the derived-bound pruning
  * ([[ManifestTable.withGeneratedDerived]]) only fires when the
  * reading session matches the pin — a mismatched reader skips the
  * derivation (slower, never wrong) instead of deriving a day bound
  * shifted by up to one day and pruning files that hold matching rows.
  */
class GeneratedTzSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = s"/tmp/graft_test/gtz_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  private val wh = "/tmp/graft_test/gtz_wh"

  private def withSessionTz[A](tz: String)(body: => A): A = {
    val old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try body finally spark.conf.set("spark.sql.session.timeZone", old)
  }

  test("CREATE pins the session timezone; sensitive writes from another zone refuse") {
    spark.conf.set("spark.sql.catalog.graft_tz", "graft.ext.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_tz.warehouse", wh)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(wh), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$wh/days"), true)
    spark.sql("DROP TABLE IF EXISTS graft_tz.days")
    spark.sql("CREATE TABLE graft_tz.days (id BIGINT, ts TIMESTAMP, " +
      "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))")
    val snap = ManifestTable.snapshot(spark, s"$wh/days")
    assert(snap.properties.get(ManifestTable.GeneratedTzKey) === Some("UTC"),
      "CREATE must pin the creating session's timezone")
    spark.sql("INSERT INTO graft_tz.days (id, ts) SELECT id, " +
      "TIMESTAMP'2024-03-05 23:30:00' FROM range(4)")
    // a timestamp→date generation is timezone-sensitive: writing from a
    // different session zone would commit values that disagree with the
    // pinned derivation — loud, with the remedy named
    val e = intercept[Exception] {
      withSessionTz("America/Los_Angeles") {
        spark.sql("INSERT INTO graft_tz.days (id, ts) SELECT id + 10, " +
          "TIMESTAMP'2024-03-05 23:30:00' FROM range(2)")
      }
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("pinned to UTC")), msgs(e).mkString(" | "))
    // matched-zone writes keep working
    spark.sql("INSERT INTO graft_tz.days (id, ts) SELECT id + 20, " +
      "TIMESTAMP'2024-03-06 01:00:00' FROM range(2)")
    assert(spark.sql("SELECT count(*) FROM graft_tz.days").head().getLong(0) === 6L)
  }

  test("timezone-FREE generation expressions write from any session zone") {
    val dir = tmp("free")
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("twice",
        org.apache.spark.sql.types.LongType,
        nullable = true,
        metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .putString(org.apache.spark.sql.catalyst.util.GeneratedColumn
            .GENERATION_EXPRESSION_METADATA_KEY, "id * 2").build())))
    ManifestTable.create(spark, dir, schema)
    assert(ManifestTable.snapshot(spark, dir).properties
      .contains(ManifestTable.GeneratedTzKey))
    withSessionTz("America/Los_Angeles") {
      ManifestTable.append((0L until 3L).toDF("id"), dir, "b0")
    }
    assert(ManifestTable.read(spark, dir).selectExpr("sum(twice)")
      .head().getLong(0) === 6L)
  }

  test("derived-bound pruning is gated on the pinned timezone") {
    spark.conf.set("spark.sql.catalog.graft_tz", "graft.ext.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_tz.warehouse", wh)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(wh), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$wh/prune"), true)
    spark.sql("DROP TABLE IF EXISTS graft_tz.prune")
    spark.sql("CREATE TABLE graft_tz.prune (id BIGINT, ts TIMESTAMP, " +
      "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) PARTITIONED BY (day)")
    // 4 days of hourly rows, one file per day (DISTRIBUTE BY the day)
    spark.sql("INSERT INTO graft_tz.prune (id, ts) " +
      "SELECT id, TIMESTAMP'2024-03-01 00:00:00' + " +
      "make_interval(0, 0, 0, 0, CAST(id AS INT)) FROM range(96) " +
      "DISTRIBUTE BY CAST(TIMESTAMP'2024-03-01 00:00:00' + " +
      "make_interval(0, 0, 0, 0, CAST(id AS INT)) AS DATE)")
    val dir = s"$wh/prune"
    val pred = "ts >= TIMESTAMP'2024-03-02 00:00:00' AND " +
      "ts < TIMESTAMP'2024-03-03 00:00:00'"
    val (kept, total) = ManifestTable.pruneInfo(spark, dir, pred)
    assert(total >= 4 && kept < total,
      s"matched-zone session must prune on the derived day bound " +
        s"($kept/$total)")
    // a mismatched session zone must SKIP the timestamp→date derivation
    // (deriving there would shift the day bound by up to one day and
    // prune files that hold matching rows); observed directly on the
    // derivation seam — ts-column stats still prune the read correctly
    val snap = ManifestTable.snapshot(spark, dir)
    val predE = spark.sessionState.sqlParser.parseExpression(pred)
    val derivedUtc = ManifestTable.withGeneratedDerived(spark, snap, predE)
    assert(!(derivedUtc eq predE),
      "matched-zone derivation must add the day conjunct")
    withSessionTz("America/Los_Angeles") {
      val derivedLA = ManifestTable.withGeneratedDerived(spark, snap, predE)
      assert(derivedLA eq predE,
        "mismatched-zone derivation must be skipped entirely")
    }
  }
}
