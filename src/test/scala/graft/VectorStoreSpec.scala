package graft

import org.apache.spark.sql.functions._

class VectorStoreSpec extends SparkSpec {
  import spark.implicits._

  /** Every `ReadSchema: struct<...>` fragment in the executed plan, with
    * everything before the marker (notably the `Location:` temp path, which
    * can randomly contain column-name substrings like `q8`) stripped off.
    * Plan-pruning assertions must grep THIS, never the whole FileScan line. */
  private def readSchemas(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString.linesIterator.flatMap { line =>
      val i = line.indexOf("ReadSchema: ")
      if (i < 0) None else Some(line.substring(i))
    }.mkString("\n")

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

  test("first append whose ids start at 1000 still seeds k centroids (k lowest ids, not ids < k)") {
    // VERDICT r9 #2: the old `id < k` seeding produced an EMPTY centroid
    // set for any first batch not containing ids 0..k-1
    val dir = java.nio.file.Files.createTempDirectory("graft-vstore-off").toString + "/s"
    graft.ext.VectorStore.append(mkVecs(1000 until 1020), dir, k = 2)
    val cents = graft.ext.VectorStore.readCentroids(spark, dir).get
      .select("cid").as[Long].collect().toSeq.sorted
    assert(cents === Seq(1000L, 1001L))  // the two lowest ids present
    // one even-cluster cell, one odd-cluster cell; search still works
    val q = Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val ids = graft.ext.VectorStore.search(spark, dir, q, nprobe = 1, topK = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(ids.length === 5 && ids.forall(_ % 2 == 0))
  }

  test("quantized search: coarse scan never reads the float column, rerank equals exact search") {
    // deliberately adversarial temp-dir name: it contains the banned
    // column substring, so this test fails loudly if anyone regresses to
    // grepping the whole FileScan line (whose Location: carries the path)
    val dir = java.nio.file.Files.createTempDirectory("graft-vstore-q8-embedding").toString + "/s"
    graft.ext.VectorStore.append(mkVecs(0 until 40), dir, k = 2)
    val q = Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    // the byte-savings claim is a PLAN property: the coarse pass's
    // parquet ReadSchema must carry q8 and not the float column
    val coarse = graft.ext.VectorStore.coarseCandidates(spark, dir, q,
      nprobe = 2, limit = 20)
    val scan = readSchemas(coarse)
    assert(scan.contains("q8") && !scan.contains("embedding"),
      s"coarse ReadSchema must prune the float column:\n$scan")
    // end-to-end: quantized two-pass == exact single-pass
    val exact = graft.ext.VectorStore.search(spark, dir, q,
      nprobe = 2, topK = 5).collect().toSeq
    val q8 = graft.ext.VectorStore.searchQuantized(spark, dir, q,
      nprobe = 2, topK = 5, rerank = 4).collect().toSeq
    assert(q8 === exact)
    // quantization is bounded: every stored q8 element fits int8
    // ([-128, 127] — floor can touch -128 when the scale division
    // rounds toward zero)
    val bad = spark.read.parquet(dir)
      .filter(exists(col("q8"), x => x > 127 || x < -128)).count()
    assert(bad === 0L)
  }

  test("searchQuantized on a pre-q8 store falls back to the exact float path") {
    // a store written before the q8 column existed: centroids + a
    // partitioned layout with only (id, vec) — no q8/scale fields
    val dir = java.nio.file.Files.createTempDirectory("graft-vstore-noq8").toString + "/s"
    val vecs = mkVecs(0 until 40)
    graft.ext.VectorStore.init(
      vecs.orderBy("vec_id").limit(2)
        .select($"vec_id".cast("long").as("cid"),
          transform($"embedding", x => x.cast("double")).as("cv")), dir)
    val cents = graft.ext.VectorStore.readCentroids(spark, dir).get
    graft.ext.Similarity.assignTo(vecs, cents, "embedding")
      .write.partitionBy("centroid_id").mode("append").parquet(dir)
    val q = Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val exact = graft.ext.VectorStore.search(spark, dir, q,
      nprobe = 2, topK = 5).collect().toSeq
    // ADVICE r9: must not fail or misbehave — same results, float scan
    val viaQ8 = graft.ext.VectorStore.searchQuantized(spark, dir, q,
      nprobe = 2, topK = 5).collect().toSeq
    assert(viaQ8 === exact)
  }

  test("pq: frozen codebook encodes every append, ADC coarse scan reads neither vector column, rerank equals exact search") {
    // adversarial name: contains BOTH banned substrings (q8, embedding) —
    // see the readSchemas note; the raw random suffix once produced
    // `…vstore-pq851117…` ⊃ "q8" and flaked this test ~1 run in 10
    val dir = java.nio.file.Files.createTempDirectory("graft-vstore-pq-q8-embedding").toString + "/s"
    val vecs = mkVecs(0 until 40)
    val cb = graft.ext.Similarity.pqTrain(vecs, m = 4, ksub = 4, iters = 2,
      dims = 8)
    // dense cids per subspace: PQ codes must fit a narrow integer type
    val cids = cb.select("cid").as[Long].collect()
    assert(cids.forall(c => c >= 0 && c < 4))
    assert(cb.select("sub").distinct().count() === 4)
    graft.ext.VectorStore.initPq(cb, dir)
    graft.ext.VectorStore.append(vecs, dir, k = 2)
    graft.ext.VectorStore.append(mkVecs(40 until 60), dir, k = 2)
    // every row carries an m-element code and its L2 norm
    val rows = spark.read.parquet(dir)
    assert(rows.filter(size($"pq_code") =!= 4 || $"norm".isNull).count() === 0L)
    val q = Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    // the byte-savings claim is a PLAN property: the ADC scan's parquet
    // ReadSchema must carry pq_code + norm and NEITHER vector column
    val coarse = graft.ext.VectorStore.pqCoarse(spark, dir, q,
      nprobe = 2, limit = 20)
    val scan = readSchemas(coarse)
    assert(scan.contains("pq_code") && scan.contains("norm") &&
      !scan.contains("embedding") && !scan.contains("q8"),
      s"ADC ReadSchema must prune both vector columns:\n$scan")
    // end-to-end: ADC two-pass == exact single-pass once the candidate
    // cut covers the probed population (ksub=4 codes cannot separate
    // this fixture's jitter-level cosine ties, so a tight cut may trade
    // a tied id — the sf-scaled oracle row pins that lossy cut
    // bit-exactly; HERE the claim is the plumbing: codes, LUTs, rerank)
    val exact = graft.ext.VectorStore.search(spark, dir, q,
      nprobe = 2, topK = 5).collect().toSeq
    val pq = graft.ext.VectorStore.searchPq(spark, dir, q,
      nprobe = 2, topK = 5, rerank = 12).collect().toSeq
    assert(pq === exact)
    // and the tight cut still lands the true nearest neighbor
    val tight = graft.ext.VectorStore.searchPq(spark, dir, q,
      nprobe = 2, topK = 5, rerank = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(tight.contains(exact.head.getLong(0)))
  }

  test("pq: zero-norm rows score 0 in the coarse pass; codebook-less stores fall back to exact search") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vstore-pq0").toString + "/s"
    val vecs = mkVecs(0 until 20)
      .unionByName(Seq((99L, Seq.fill(8)(0.0f))).toDF("vec_id", "embedding"))
    graft.ext.VectorStore.initPq(
      graft.ext.Similarity.pqTrain(vecs, m = 4, ksub = 4, iters = 2, dims = 8),
      dir)
    graft.ext.VectorStore.append(vecs, dir, k = 2)
    val q = Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    // the all-zero vector's ADC cosine is exactly 0 — not NaN, not null
    val acos = graft.ext.VectorStore.pqCoarse(spark, dir, q,
        nprobe = 2, limit = 30)
      .filter($"vec_id" === 99L).select("acos").as[Double].collect()
    assert(acos.toSeq === Seq(0.0))
    // a store with no frozen codebook: searchPq = search, no failure
    val plain = java.nio.file.Files.createTempDirectory("graft-vstore-nopq").toString + "/s"
    graft.ext.VectorStore.append(mkVecs(0 until 20), plain, k = 2)
    assert(graft.ext.VectorStore.searchPq(spark, plain, q,
        nprobe = 2, topK = 5).collect().toSeq ===
      graft.ext.VectorStore.search(spark, plain, q,
        nprobe = 2, topK = 5).collect().toSeq)
  }

  test("manifest-committed store: idempotent appends, stats-pruned probe, time travel, compaction") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vstore-mt").toString + "/s"
    // appends are atomic commits with replay idempotence — the window
    // the hive layout's bare directory append can't close
    assert(graft.ext.VectorStore.appendCommitted(mkVecs(0 until 20), dir, "b0", k = 2))
    assert(!graft.ext.VectorStore.appendCommitted(mkVecs(0 until 20), dir, "b0", k = 2))
    assert(graft.ext.VectorStore.appendCommitted(mkVecs(20 until 40), dir, "b1", k = 2))
    val q = Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    // search semantics identical to the hive layout: top-k inside the
    // probed cell equals brute force over that cell's population
    val ids = graft.ext.VectorStore.search(spark, dir, q, nprobe = 1, topK = 5)
      .select("vec_id").as[Long].collect().toSeq
    val brute = mkVecs(0 until 40).filter($"vec_id" % 2 === 0)
      .withColumn("cos", graft.ext.Similarity.cosine($"embedding",
        array(q.map(lit): _*)))
      .orderBy($"cos".desc, $"vec_id").limit(5)
      .select("vec_id").as[Long].collect().toSeq
    assert(ids === brute)
    // cell pruning is now MANIFEST pruning: a one-cell probe keeps a
    // strict subset of the snapshot's files (commit-time stats, no
    // listing, no footer reads)
    val (kept, total) = graft.ext.ManifestTable.pruneInfo(spark, dir,
      graft.ext.ManifestTable.inPredicate("centroid_id", Seq(0L)))
    assert(kept < total, s"expected a one-cell probe to prune: $kept/$total")
    // ...and the rerank's candidate-id IN prunes FURTHER on id stats +
    // per-file blooms — the capability the hive layout never had
    val (keptIds, _) = graft.ext.ManifestTable.pruneInfo(spark, dir,
      graft.ext.ManifestTable.inPredicate("centroid_id", Seq(0L)) +
        " AND " + graft.ext.ManifestTable.inPredicate("vec_id", Seq(2L)))
    assert(keptIds <= kept && keptIds < total)
    // quantized two-pass equals exact on the committed layout
    assert(graft.ext.VectorStore.searchQuantized(spark, dir, q,
        nprobe = 2, topK = 5, rerank = 4).collect().toSeq ===
      graft.ext.VectorStore.search(spark, dir, q, nprobe = 2, topK = 5)
        .collect().toSeq)
    // TIME TRAVEL: pinned to the version b0 committed, the search sees
    // only the first batch — 20 rows, not 40
    assert(graft.ext.VectorStore.search(spark, dir, q, nprobe = 2,
      topK = 40, asOfVersion = Some(1L)).count() === 20L)
    // re-clustering compaction is one manifest swap; results unchanged
    val (nin, nout) = graft.ext.VectorStore.compactCommitted(spark, dir)
    assert(nin > 0 && nout > 0)
    assert(graft.ext.VectorStore.search(spark, dir, q, nprobe = 1, topK = 5)
      .select("vec_id").as[Long].collect().toSeq === brute)
  }

  test("searchMany on a manifest-committed store prunes to the union of probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vstore-mtm").toString + "/s"
    graft.ext.VectorStore.appendCommitted(mkVecs(0 until 40), dir, "b0", k = 2)
    val qs = mkVecs(5 until 8)
      .select($"vec_id".as("qid"),
        transform($"embedding", x => x.cast("double")).as("q_vec"))
    val got = graft.ext.VectorStore.searchMany(spark, dir, qs,
        topK = 3, nprobe = 1)
      .orderBy("qid", "nn_rank")
      .select("qid", "nn_id").as[(Long, Long)].collect().toSeq
    val expected = Seq(5L, 6L, 7L).flatMap { qid =>
      val q = mkVecs(0 until 40).filter($"vec_id" === qid)
        .select(transform($"embedding", x => x.cast("double")).as("v"))
        .collect()(0).getSeq[Double](0)
      graft.ext.VectorStore.search(spark, dir, q, nprobe = 1, topK = 3,
          excludeId = Some(qid))
        .select("vec_id").as[Long].collect().toSeq.map(qid -> _)
    }
    assert(got === expected)
  }

  test("searchMany excludeSelf=false keeps a neighbor whose vec_id collides with a qid") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vstore-self").toString + "/s"
    graft.ext.VectorStore.append(mkVecs(0 until 40), dir, k = 2)
    // qid 6 is ALSO a corpus vec_id; with an unrelated qid space the
    // collision must not silently drop vector 6 from its own results
    val qs = mkVecs(6 until 7)
      .select($"vec_id".as("qid"),
        transform($"embedding", x => x.cast("double")).as("q_vec"))
    def ids(excludeSelf: Boolean): Seq[Long] =
      graft.ext.VectorStore.searchMany(spark, dir, qs, topK = 3, nprobe = 1,
          excludeSelf = excludeSelf)
        .orderBy("nn_rank").select("nn_id").as[Long].collect().toSeq
    val kept = ids(excludeSelf = false)
    assert(kept.head === 6L)           // the vector itself is its top hit
    assert(!ids(excludeSelf = true).contains(6L))
  }

  test("searchMany: a frame of queries in one plan, per-query top-k equals single-query search") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vstore-many").toString + "/s"
    graft.ext.VectorStore.append(mkVecs(0 until 40), dir, k = 2)
    // three queries spanning both cells — parquet-backed with a
    // selective filter, the production shape (a LocalRelation query side
    // defeats the DPP selectivity heuristic)
    val qsrc = dir + "_queries"
    mkVecs(0 until 40).write.mode("overwrite").parquet(qsrc)
    val qs = spark.read.parquet(qsrc).filter($"vec_id".isin(5L, 6L, 7L))
      .select($"vec_id".as("qid"),
        transform($"embedding", x => x.cast("double")).as("q_vec"))
    val many = graft.ext.VectorStore.searchMany(spark, dir, qs,
      topK = 3, nprobe = 1)
    val got = many.orderBy("qid", "nn_rank")
      .select("qid", "nn_id").as[(Long, Long)].collect().toSeq
    // the probed-cells join prunes the partitioned scan at RUNTIME:
    // dynamic partition pruning must appear on the store scan (the cell
    // set is data-dependent, so static pruning is impossible here)
    val plan = many.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on centroid_id:\n$plan")
    // each query must agree with the single-query path at the same probe
    val expected = Seq(5L, 6L, 7L).flatMap { qid =>
      val q = mkVecs(0 until 40).filter($"vec_id" === qid)
        .select(transform($"embedding", x => x.cast("double")).as("v"))
        .collect()(0).getSeq[Double](0)
      graft.ext.VectorStore.search(spark, dir, q, nprobe = 1, topK = 3,
          excludeId = Some(qid))
        .select("vec_id").as[Long].collect().toSeq.map(qid -> _)
    }
    assert(got === expected)
  }

  test("drift detection and in-place retrain repair a drifted store") {
    val dir = "/tmp/graft_test/vstore_retrain/s"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    assert(graft.ext.VectorStore.appendCommitted(
      mkVecs(0 until 60), dir, "b0", k = 2))
    val fresh = graft.ext.VectorStore.driftStats(spark, dir)
    // drift: a third cluster far from both centroids — frozen cells
    // swallow it, the quantization error spikes
    val far = (100 until 160).map { i =>
      (i.toLong, Seq.fill(8)(5.0f).zipWithIndex.map { case (x, j) =>
        x + 0.001f * ((i + j) % 5) })
    }.toDF("vec_id", "embedding")
    assert(graft.ext.VectorStore.appendCommitted(far, dir, "b1"))
    val drifted = graft.ext.VectorStore.driftStats(spark, dir)
    assert(drifted.meanSqDist > fresh.meanSqDist * 2,
      s"drift signal missing: ${fresh.meanSqDist} -> ${drifted.meanSqDist}")
    // retrain: Lloyd over the current rows, atomic data swap, new cells
    assert(graft.ext.VectorStore.retrain(spark, dir, "rt0", k = 3))
    assert(!graft.ext.VectorStore.retrain(spark, dir, "rt0"),
      "replayed retrain must be a no-op")
    val after = graft.ext.VectorStore.driftStats(spark, dir)
    assert(after.meanSqDist < drifted.meanSqDist,
      s"retrain did not lower the objective: " +
        s"${drifted.meanSqDist} -> ${after.meanSqDist}")
    assert(after.cells === 3)
    // a probe near the drifted cluster now finds it in ONE cell
    val q = Seq.fill(8)(5.0)
    val hits = graft.ext.VectorStore.search(spark, dir, q,
      nprobe = 1, topK = 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(hits.length === 10 && hits.forall(_ >= 100L),
      s"post-retrain probe missed the drifted cluster: $hits")
    // rows survived the swap exactly once
    assert(graft.ext.ManifestTable.read(spark, dir).count() === 120L)
    // the hive layout refuses (its cells are directories)
    val hiveDir = "/tmp/graft_test/vstore_retrain/hive"
    fs.delete(new org.apache.hadoop.fs.Path(hiveDir), true)
    graft.ext.VectorStore.append(mkVecs(0 until 10), hiveDir, k = 2)
    intercept[IllegalArgumentException] {
      graft.ext.VectorStore.retrain(spark, hiveDir, "rt1")
    }
  }
}
