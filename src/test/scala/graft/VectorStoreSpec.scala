package graft

import org.apache.spark.sql.functions._

class VectorStoreSpec extends SparkSpec {
  import spark.implicits._

  private def mkVecs(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map { i =>
      // two well-separated clusters in 8-dim: even ids hug axis 0,
      // odd ids hug axis 1, with small deterministic jitter
      val base = if (i % 2 == 0) Seq(1.0, 0.05, 0, 0, 0, 0, 0, 0)
      else Seq(0.05, 1.0, 0, 0, 0, 0, 0, 0)
      (i.toLong, base.zipWithIndex.map { case (x, j) =>
        (x + 0.001 * ((i * 7 + j) % 5)).toFloat })
    }.toDF("vec_id", "embedding")

  test("vector store: frozen cells across appends, partition-pruned search, correct top-k") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vstore").toString + "/s"
    // first append seeds centroids from ids 0 and 1 (k=2): one per cluster
    graft.ext.VectorStore.append(mkVecs(0 until 20), dir, k = 2)
    graft.ext.VectorStore.append(mkVecs(20 until 40), dir, k = 2)
    // physical layout: one directory per cell, centroids hidden
    val parts = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("centroid_id=")).sorted
    assert(parts === Array("centroid_id=0", "centroid_id=1"))
    // search near the even-cluster axis with nprobe=1: every hit is even
    // (cell 0), because odd vectors live in the other partition
    val q = Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val res = graft.ext.VectorStore.search(spark, dir, q,
      nprobe = 1, topK = 5)
    val ids = res.select("vec_id").as[Long].collect().toSeq
    assert(ids.length === 5 && ids.forall(_ % 2 == 0))
    // the scan is partition-pruned: the executed plan carries a
    // PartitionFilters entry on centroid_id — the nprobe/k read is
    // enforced by layout, not by a post-scan filter
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"expected partition pruning on centroid_id:\n$plan")
    // correctness vs brute force within the probed cell
    val brute = mkVecs(0 until 40).filter($"vec_id" % 2 === 0)
      .withColumn("cos", graft.ext.Similarity.cosine($"embedding",
        array(q.map(lit): _*)))
      .orderBy($"cos".desc, $"vec_id").limit(5)
      .select("vec_id").as[Long].collect().toSeq
    assert(ids === brute)
    // nprobe=2 reaches both cells
    val both = graft.ext.VectorStore.search(spark, dir, q,
      nprobe = 2, topK = 40)
    assert(both.count() === 40)
    // two appends leave multiple files per cell; per-cell compaction
    // folds each to one without touching content
    val (nin, nout) = graft.ext.VectorStore.compactCells(spark, dir)
    assert(nin > nout && nout === 2)
    assert(graft.ext.VectorStore.search(spark, dir, q, nprobe = 2, topK = 40)
      .count() === 40)
  }
}
