package graft

import graft.ext.ManifestTable

/** CHECK constraints on the manifest table (VERDICT r11 #5): recorded
  * in the log, replayed across deltas and checkpoints, enforced with
  * row counts on every path that introduces or changes rows, and
  * following SQL CHECK semantics (only FALSE fails; NULL passes —
  * NOT NULL is `col IS NOT NULL`).
  */
class ManifestConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/graft_test/mcons_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  private def batch(rows: (Long, String)*) = rows.toDF("id", "text")

  test("violating appends fail loudly with the row count; valid ones commit") {
    val dir = tmp("append")
    ManifestTable.append(batch(1L -> "a", 2L -> "b"), dir, "b0")
    assert(ManifestTable.addConstraint(spark, dir, "text_nonnull",
      "text IS NOT NULL"))
    assert(ManifestTable.addConstraint(spark, dir, "id_pos", "id > 0"))
    // re-adding the identical constraint is a no-op
    assert(!ManifestTable.addConstraint(spark, dir, "id_pos", "id > 0"))
    val v = ManifestTable.snapshot(spark, dir).version
    val e = intercept[IllegalArgumentException] {
      ManifestTable.append(
        Seq((3L, "c"), (-1L, null), (-2L, "d")).toDF("id", "text"),
        dir, "b1")
    }
    assert(e.getMessage.contains("id_pos") &&
      e.getMessage.contains("2 row(s)"))
    assert(e.getMessage.contains("text_nonnull") &&
      e.getMessage.contains("1 row(s)"))
    // nothing committed; a fully valid batch then lands
    assert(ManifestTable.snapshot(spark, dir).version === v)
    assert(ManifestTable.append(batch(3L -> "c"), dir, "b2"))
    assert(ManifestTable.read(spark, dir).count() === 3L)
  }

  test("constraints survive the log round-trip, checkpoints and a cold driver") {
    val dir = tmp("replay")
    ManifestTable.append(batch(1L -> "a"), dir, "b0")
    assert(ManifestTable.addConstraint(spark, dir, "id_pos", "id > 0"))
    // push past a checkpoint boundary (interval 10)
    (1 to 10).foreach(i =>
      ManifestTable.append(batch(100L + i -> s"x$i"), dir, s"b$i"))
    ManifestTable.clearSnapshotCacheForTest()
    val s = ManifestTable.snapshot(spark, dir)
    assert(s.constraints === Map("id_pos" -> "id > 0"))
    intercept[IllegalArgumentException] {
      ManifestTable.append(batch(0L -> "zero"), dir, "bz")
    }
    // dropped constraints stay dropped across replay
    assert(ManifestTable.dropConstraint(spark, dir, "id_pos"))
    assert(!ManifestTable.dropConstraint(spark, dir, "id_pos"))
    ManifestTable.clearSnapshotCacheForTest()
    assert(ManifestTable.snapshot(spark, dir).constraints.isEmpty)
    assert(ManifestTable.append(batch(0L -> "zero"), dir, "bz2"))
  }

  test("addConstraint refuses when existing rows violate it") {
    val dir = tmp("existing")
    ManifestTable.append(batch(1L -> "a", -5L -> "neg"), dir, "b0")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.addConstraint(spark, dir, "id_pos", "id > 0")
    }
    assert(e.getMessage.contains("1 existing row(s)"))
    assert(ManifestTable.snapshot(spark, dir).constraints.isEmpty)
  }

  test("merge and both updates enforce; NULL passes CHECK (SQL semantics)") {
    val dir = tmp("ops")
    ManifestTable.append(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "text", "n"),
      dir, "b0")
    assert(ManifestTable.addConstraint(spark, dir, "n_pos", "n > 0"))
    intercept[IllegalArgumentException] {
      ManifestTable.merge(Seq((2L, "b2", -1L)).toDF("id", "text", "n"),
        dir, Seq("id"), "m0")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.updateWhere(spark, dir, "id = 1",
        Map("n" -> "-n"), "u0")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.updateWhereDV(spark, dir, "id = 1",
        Map("n" -> "-n"), "u1")
    }
    // NULL n passes CHECK n > 0 (the SQL contract; NOT NULL is explicit)
    assert(ManifestTable.merge(
      Seq((3L, "c", null.asInstanceOf[java.lang.Long]))
        .toDF("id", "text", "n"), dir, Seq("id"), "m1"))
    // table unchanged by the failed ops, extended by the null-n merge
    assert(ManifestTable.read(spark, dir).select("id").as[Long]
      .collect().toSeq.sorted === Seq(1L, 2L, 3L))
    // the metadata commits are invisible to the feeds (like compactions)
    assert(ManifestTable.appendsBetween(spark, dir, 0L,
      ManifestTable.snapshot(spark, dir).version)
      .select("id").as[Long].collect().toSeq.sorted === Seq(1L, 2L, 3L))
  }
}
