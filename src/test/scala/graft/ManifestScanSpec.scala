package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.ext.ManifestTable

/** The planner-integrated manifest read ([[graft.ext.ManifestFileIndex]]):
  * filters pushed by Catalyst must prune the FILE LIST at planning time
  * (observable in the scan's numFiles metric), results must equal the
  * side-channel APIs exactly, and the relation must compose with later
  * `.where`s, time travel and schema evolution.
  */
class ManifestScanSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/graft_test/manifestscan_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  /** Execute `df` and return the parquet scan's numFiles metric. */
  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size === 1, s"expected one parquet scan, got ${scans.size}")
    scans.head.metrics("numFiles").value
  }

  private def clustered(name: String): String = {
    val dir = tmp(name)
    (0 until 4).foreach { i =>
      ManifestTable.append(
        (0L until 400L).filter(_ % 4 == i).map(x => (x, s"doc $x"))
          .toDF("id", "text").coalesce(1), dir, s"b$i")
    }
    ManifestTable.compact(spark, dir, targetFileBytes = 2L * 1024,
      clusterBy = Seq("id"))
    dir
  }

  test("a .where on the scan prunes files through the planner") {
    val dir = clustered("planner")
    val total = ManifestTable.snapshot(spark, dir).files.size
    assert(total > 2)
    assert(filesRead(ManifestTable.scan(spark, dir)) === total)
    val banded = ManifestTable.scan(spark, dir).where("id >= 10 AND id < 40")
    assert(filesRead(banded) < total)
    // pruning never changes results: exact match with the full scan
    assert(banded.select("id").as[Long].collect().toSeq.sorted ===
      (10L until 40L).toSeq)
  }

  test("filters compose: a where added after projections still prunes") {
    val dir = clustered("compose")
    val total = ManifestTable.snapshot(spark, dir).files.size
    // the filter sits ABOVE a projection and an alias — exactly the shape
    // readWhere's string API can never see; the planner pushes it down
    val df = ManifestTable.scan(spark, dir)
      .select(col("id").as("doc"), length(col("text")).as("n"))
      .where("doc < 20")
    assert(filesRead(df) < total)
    assert(df.select("doc").as[Long].collect().toSeq.sorted ===
      (0L until 20L).toSeq)
  }

  test("spark.sql over a view of the scan prunes identically") {
    val dir = clustered("sqlview")
    val total = ManifestTable.snapshot(spark, dir).files.size
    ManifestTable.scan(spark, dir).createOrReplaceTempView("mt")
    val df = spark.sql("SELECT id FROM mt WHERE id >= 350")
    assert(filesRead(df) < total)
    assert(df.as[Long].collect().toSeq.sorted === (350L until 400L).toSeq)
  }

  test("bloom sidecars prune point lookups through the planner") {
    val dir = tmp("bloom")
    // interleaved appends: every file's [min, max] spans the key space,
    // stats keep everything — only the blooms can prune the point probe
    (0 until 4).foreach { i =>
      ManifestTable.append(
        (0L until 400L).filter(_ % 4 == i).map(x => (x, s"doc $x"))
          .toDF("id", "text").coalesce(1), dir, s"b$i",
        bloomCols = Seq("id"))
    }
    val df = ManifestTable.scan(spark, dir).where("id = 217")
    assert(filesRead(df) < 4)
    assert(df.select("text").as[String].collect().toSeq === Seq("doc 217"))
  }

  test("large IN lists (the optimizer's InSet shape) still prune") {
    val dir = tmp("inset")
    (0 until 4).foreach { i =>
      ManifestTable.append(
        (0L until 400L).filter(_ % 4 == i).map(x => (x, s"doc $x"))
          .toDF("id", "text").coalesce(1), dir, s"b$i",
        bloomCols = Seq("id"))
    }
    // 12 keys > spark.sql.optimizer.inSetConversionThreshold (10): the
    // filter reaches the FileIndex as InSet with internal values, not In.
    // All keys ≡ 1 (mod 4), so only one file's bloom admits any of them.
    val keys = (0 until 12).map(i => 1L + 4 * i)
    val df = ManifestTable.scan(spark, dir).where(col("id").isin(keys: _*))
    assert(filesRead(df) < 4)
    assert(df.select("id").as[Long].collect().toSeq.sorted === keys)
  }

  test("the planner path never LISTs data/: statuses come from manifest sizes (VERDICT r11 #2)") {
    val dir = clustered("nolist")
    val n0 = graft.ext.ManifestFileIndex.dataDirListings.get()
    val got = ManifestTable.scan(spark, dir).where("id < 40")
      .select("id").as[Long].collect().toSeq.sorted
    assert(got === (0L until 40L))
    assert(graft.ext.ManifestFileIndex.dataDirListings.get() === n0,
      "ManifestFileIndex listed data/ despite manifest-recorded sizes")
    // a PRE-SIZES manifest (size: lines stripped from the log) falls
    // back to one listing and still answers exactly
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val md = new org.apache.hadoop.fs.Path(s"$dir/_manifest")
    fs.listStatus(md).filter(_.getPath.getName.matches("[vd]\\d{8,}"))
      .foreach { st =>
        val in = fs.open(st.getPath)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toList finally in.close()
        val out = fs.create(st.getPath, true)
        try out.write(lines.filterNot(_.startsWith("size:"))
          .mkString("\n").getBytes("UTF-8"))
        finally out.close()
      }
    graft.ext.ManifestTable.clearSnapshotCacheForTest() // sizes changed on disk
    val got2 = ManifestTable.scan(spark, dir).where("id < 40")
      .select("id").as[Long].collect().toSeq.sorted
    assert(got2 === (0L until 40L))
    assert(graft.ext.ManifestFileIndex.dataDirListings.get() === n0 + 1)
  }

  test("versionAsOf pins a historical snapshot with its own pruning") {
    val dir = tmp("travel")
    ManifestTable.append(batchDf(1L, 2L), dir, "b0") // v1
    ManifestTable.append(batchDf(3L), dir, "b1")     // v2
    ManifestTable.deleteWhere(spark, dir, "id = 1", "d0") // v3
    assert(ManifestTable.scan(spark, dir).select("id")
      .as[Long].collect().toSeq.sorted === Seq(2L, 3L))
    assert(ManifestTable.scan(spark, dir, asOf = Some(2L)).select("id")
      .as[Long].collect().toSeq.sorted === Seq(1L, 2L, 3L))
  }

  test("timestampAsOf pins the newest commit at or before the instant") {
    val dir = tmp("tstravel")
    ManifestTable.append(batchDf(1L, 2L), dir, "b0") // v1
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    ManifestTable.append(batchDf(3L), dir, "b1")     // v2
    assert(spark.read.format("graft-manifest")
      .option("timestampAsOf", between.toString).load(dir)
      .count() === 2L)
    assert(spark.read.format("graft-manifest")
      .option("timestampAsOf", System.currentTimeMillis().toString)
      .load(dir).count() === 3L)
    // the two pins are mutually exclusive, loudly
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-manifest")
        .option("versionAsOf", "1").option("timestampAsOf", "1")
        .load(dir).count()
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("schema evolution: the scan projects the recorded table schema") {
    val dir = tmp("evolve")
    ManifestTable.append(batchDf(1L), dir, "b0")
    ManifestTable.append(Seq((2L, "doc 2", "en"))
      .toDF("id", "text", "lang"), dir, "b1")
    val got = ManifestTable.scan(spark, dir)
      .as[(Long, String, Option[String])].collect().toSeq.sortBy(_._1)
    assert(got === Seq((1L, "doc 1", None), (2L, "doc 2", Some("en"))))
  }

  private def batchDf(ids: Long*): org.apache.spark.sql.DataFrame =
    ids.map(i => (i, s"doc $i")).toDF("id", "text")
}
