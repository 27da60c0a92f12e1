package graft

import org.apache.spark.sql.functions._
import graft.ext.ManifestTable

/** PARTITIONED manifest tables (VERDICT r11 order #6 / r12 #5): a
  * layout declared at creation makes every data file hold exactly one
  * partition tuple, recorded in the manifest — so partition predicates
  * prune files EXACTLY (point stats, not [min, max] intervals) through
  * both `readWhere` and the planner-integrated scan, the partition
  * columns stay PHYSICAL in the files (every non-partition read path is
  * untouched), row-level ops and compaction preserve the invariant, and
  * `partitions()` enumerates the layout from metadata alone.
  */
class ManifestPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/graft_test/mpart_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  private def docs(ids: Range, city: Long => String) =
    ids.map(i => (i.toLong, city(i.toLong), s"doc $i"))
      .toDF("id", "city", "text")

  private val cityOf: Long => String =
    i => Seq("sf", "nyc", "ber")((i % 3).toInt)

  test("declaration, inheritance and the one-tuple-per-file invariant") {
    val dir = tmp("decl")
    ManifestTable.append(docs(0 until 90, cityOf), dir, "b0",
      partitionBy = Seq("city"))
    ManifestTable.append(docs(90 until 180, cityOf), dir, "b1") // inherits
    val s = ManifestTable.snapshot(spark, dir)
    assert(s.partitionCols === Seq("city"))
    // every file carries its tuple, and the recorded value is exact
    assert(s.files.nonEmpty)
    s.files.foreach { f =>
      val pv = s.pvals(f)("city")
      assert(pv.fam === "string" && pv.value.isDefined)
    }
    // the partition column is PHYSICAL: a plain read sees it
    val got = ManifestTable.read(spark, dir)
      .select("id", "city").as[(Long, String)].collect()
    assert(got.length === 180)
    assert(got.forall { case (i, c) => c == cityOf(i) })
    // a conflicting layout on a later append raises
    intercept[IllegalArgumentException] {
      ManifestTable.append(docs(180 until 181, cityOf), dir, "b2",
        partitionBy = Seq("text"))
    }
    // declaring on a table that already has unpartitioned data raises
    val flat = tmp("flat")
    ManifestTable.append(docs(0 until 10, cityOf), flat, "b0")
    intercept[IllegalArgumentException] {
      ManifestTable.append(docs(10 until 20, cityOf), flat, "b1",
        partitionBy = Seq("city"))
    }
    // a non-stats-faithful partition type raises at declaration
    val bad = tmp("badtype")
    intercept[IllegalArgumentException] {
      ManifestTable.append(
        Seq((1L, Array(1.0f), "x")).toDF("id", "emb", "text"), bad, "b0",
        partitionBy = Seq("emb"))
    }
  }

  test("partition predicates prune EXACTLY through readWhere and the planner scan") {
    val dir = tmp("prune")
    ManifestTable.append(docs(0 until 300, cityOf), dir, "b0",
      partitionBy = Seq("city"))
    ManifestTable.append(docs(300 until 600, cityOf), dir, "b1")
    val s = ManifestTable.snapshot(spark, dir)
    val sfFiles = s.files.count(f => s.pvals(f)("city").value.contains("sf"))
    assert(sfFiles > 0 && sfFiles < s.files.size)
    // exact: keeps the sf partition's files, drops every other file
    assert(ManifestTable.pruneInfo(spark, dir, "city = 'sf'") ===
      ((sfFiles, s.files.size)))
    assert(ManifestTable.readWhere(spark, dir, "city = 'sf'")
      .count() === 200L)
    // IN and <> prune one-sidedly too (IN keeps two partitions; the
    // negation keeps the complement)
    assert(ManifestTable.pruneInfo(spark, dir,
      "city IN ('sf', 'ber')")._1 ===
      s.files.count(f => Seq("sf", "ber")
        .exists(s.pvals(f)("city").value.contains)))
    // the PLANNER path reads exactly the partition's files (collect()
    // runs df's OWN query execution, whose metrics we then read)
    val df = ManifestTable.scan(spark, dir).where("city = 'nyc'")
    assert(df.collect().length === 200)
    val read = df.queryExecution.executedPlan.collect {
      case fsc: org.apache.spark.sql.execution.FileSourceScanExec =>
        fsc.metrics("numFiles").value
    }.sum
    assert(read === s.files.size - sfFiles - sfFiles,
      s"scan read $read files") // nyc files = total - sf - ber (equal splits)
  }

  test("the hive null partition round-trips and prunes") {
    val dir = tmp("nullpart")
    val d = Seq((1L, "sf", "a"), (2L, null, "b"), (3L, "sf", "c"),
      (4L, null, "d")).toDF("id", "city", "text")
    ManifestTable.append(d, dir, "b0", partitionBy = Seq("city"))
    val s = ManifestTable.snapshot(spark, dir)
    val nullFiles = s.files.count(f => s.pvals(f)("city").value.isEmpty)
    assert(nullFiles > 0 && nullFiles < s.files.size)
    // IS NULL keeps only the null partition; equality drops it
    assert(ManifestTable.pruneInfo(spark, dir, "city IS NULL")._1 ===
      nullFiles)
    assert(ManifestTable.pruneInfo(spark, dir, "city = 'sf'")._1 ===
      s.files.size - nullFiles)
    assert(ManifestTable.readWhere(spark, dir, "city IS NULL")
      .select("id").as[Long].collect().toSeq.sorted === Seq(2L, 4L))
    assert(ManifestTable.read(spark, dir).count() === 4L)
  }

  test("'' and null partition values stay DISTINCT through read, delete, overwrite") {
    // Spark's path writer sends both null and '' to
    // __HIVE_DEFAULT_PARTITION__; a raw directory decode conflated them,
    // recorded '' as the null tuple, and the "exact" point pruning then
    // proved `city = ''` matched nothing — read, deleteWhere and
    // overwriteWhere silently dropped rows whose bytes were in the file.
    val dir = tmp("emptykey")
    val d = Seq((1L, "", "a"), (2L, null, "b"), (3L, "sf", "c"),
      (4L, "", "d"), (5L, null, "e")).toDF("id", "city", "text")
    ManifestTable.append(d, dir, "b0", partitionBy = Seq("city"))
    val s = ManifestTable.snapshot(spark, dir)
    // the manifest records '' as Some("") and null as None — distinct
    val emptyFiles = s.files.filter(f => s.pvals(f)("city").value.contains(""))
    val nullFiles = s.files.filter(f => s.pvals(f)("city").value.isEmpty)
    assert(emptyFiles.nonEmpty && nullFiles.nonEmpty)
    assert(emptyFiles.toSet.intersect(nullFiles.toSet).isEmpty)
    // read: equality on '' finds its rows; IS NULL finds only true nulls
    assert(ManifestTable.readWhere(spark, dir, "city = ''")
      .select("id").as[Long].collect().toSeq.sorted === Seq(1L, 4L))
    assert(ManifestTable.readWhere(spark, dir, "city IS NULL")
      .select("id").as[Long].collect().toSeq.sorted === Seq(2L, 5L))
    assert(ManifestTable.pruneInfo(spark, dir, "city = ''")._1 ===
      emptyFiles.size)
    // the planner-integrated scan agrees
    assert(ManifestTable.scan(spark, dir).where("city = ''")
      .select("id").as[Long].collect().toSeq.sorted === Seq(1L, 4L))
    // overwriteWhere: replaces exactly the '' partition
    ManifestTable.overwriteWhere(
      Seq((6L, "", "f")).toDF("id", "city", "text"), dir, "city = ''", "o0")
    assert(ManifestTable.read(spark, dir).select("id").as[Long]
      .collect().toSeq.sorted === Seq(2L, 3L, 5L, 6L))
    // deleteWhere: removes exactly the '' partition's rows
    assert(ManifestTable.deleteWhere(spark, dir, "city = ''", "d0"))
    assert(ManifestTable.read(spark, dir).select("id").as[Long]
      .collect().toSeq.sorted === Seq(2L, 3L, 5L))
    // nulls survived both ops untouched
    assert(ManifestTable.readWhere(spark, dir, "city IS NULL")
      .select("id").as[Long].collect().toSeq.sorted === Seq(2L, 5L))
  }

  test("clustered and z-ordered compaction preserve the partition invariant") {
    val dir = tmp("cluster")
    val d = (0L until 400L)
      .map(i => (i, Seq("sf", "nyc")((i % 2).toInt), i * 7 % 400, s"doc $i"))
      .toDF("id", "city", "score", "text")
    ManifestTable.append(d, dir, "b0", partitionBy = Seq("city"))
    // range-clustering on id: each output file still holds one tuple
    // (the partitioned stage write splits each range by tuple)
    ManifestTable.compact(spark, dir, targetFileBytes = 4L * 1024,
      clusterBy = Seq("id"))
    val s1 = ManifestTable.snapshot(spark, dir)
    s1.files.foreach(f => assert(
      s1.pvals.get(f).exists(_.contains("city")),
      "clustered compaction lost a partition tuple"))
    // clustering built id-skipping power WITHIN the partition layout:
    // an (id band AND partition) predicate prunes on both axes
    val (kept, total) = ManifestTable.pruneInfo(spark, dir,
      "city = 'sf' AND id >= 100 AND id < 140")
    assert(kept < total / 2, s"clustered+partitioned pruning kept $kept/$total")
    // z-order on two numeric dims over the same partitioned table
    ManifestTable.compact(spark, dir, targetFileBytes = 4L * 1024,
      clusterBy = Seq("id", "score"), zorder = true)
    val s2 = ManifestTable.snapshot(spark, dir)
    s2.files.foreach(f => assert(
      s2.pvals.get(f).exists(_.contains("city")),
      "z-ordered compaction lost a partition tuple"))
    assert(ManifestTable.read(spark, dir).count() === 400L)
  }

  test("row ops, DV purge and compaction preserve the partition invariant") {
    val dir = tmp("ops")
    ManifestTable.append(docs(0 until 300, cityOf), dir, "b0",
      partitionBy = Seq("city"))
    // CoW delete rewrites candidates through the partitioned stage
    assert(ManifestTable.deleteWhere(spark, dir, "id < 30", "d0"))
    // DV update appends rewritten rows through it too
    assert(ManifestTable.updateWhereDV(spark, dir, "id = 200",
      Map("text" -> "'updated'"), "u0"))
    assert(ManifestTable.purgeDeletes(spark, dir, 0.0001)._1 > 0)
    // compaction reshuffles ON the partition columns
    ManifestTable.compact(spark, dir)
    val s = ManifestTable.snapshot(spark, dir)
    assert(s.partitionCols === Seq("city"))
    s.files.foreach { f =>
      assert(s.pvals.get(f).exists(_.contains("city")),
        s"file $f lost its partition tuple")
    }
    // pruning still exact after the full op mix
    val sfFiles = s.files.count(f => s.pvals(f)("city").value.contains("sf"))
    assert(ManifestTable.pruneInfo(spark, dir, "city = 'sf'") ===
      ((sfFiles, s.files.size)))
    // and the rows are right
    val got = ManifestTable.read(spark, dir)
      .select("id", "text").as[(Long, String)].collect().toMap
    assert(got.size === 270)
    assert(got(200L) === "updated" && !got.contains(10L))
    // partitions() enumerates the layout with exact metadata counts
    val parts = ManifestTable.partitions(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toMap
    assert(parts.keySet === Set("sf", "nyc", "ber"))
    assert(parts.values.map(_._2.get).sum === 270L)
  }

  test("long and boolean partition values prune with numeric semantics") {
    val dir = tmp("typed")
    val d = (0L until 100L).map(i => (i, i % 4, i % 2 == 0))
      .toDF("id", "bucket", "flag")
    ManifestTable.append(d, dir, "b0", partitionBy = Seq("bucket", "flag"))
    val s = ManifestTable.snapshot(spark, dir)
    assert(s.files.forall(f => s.pvals(f)("bucket").fam == "long" &&
      s.pvals(f)("flag").fam == "bool"))
    // numeric comparison, not string: bucket >= 2 keeps buckets {2, 3}
    val hi = s.files.count(f =>
      s.pvals(f)("bucket").value.exists(_.toLong >= 2L))
    assert(ManifestTable.pruneInfo(spark, dir, "bucket >= 2")._1 === hi)
    assert(ManifestTable.readWhere(spark, dir,
      "bucket >= 2 AND flag").select("id").as[Long].collect().toSeq.sorted
      === (0L until 100L).filter(i => i % 4 >= 2 && i % 2 == 0))
    // flag is determined by bucket parity: 4 live tuples, not 8
    assert(ManifestTable.partitions(spark, dir).count() === 4L)
  }
}
