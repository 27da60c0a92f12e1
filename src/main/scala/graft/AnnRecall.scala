package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off RECALL EVIDENCE for the IVF vector store at ~10× the
  * spec-pinned corpus (VERDICT r17 stretch #8): the suite pins the
  * store's nprobe/topK disk-read contracts and exact-replay hashes at
  * sf0.01 (500 vectors); this tool measures recall@10 against
  * brute-force ground truth on a 20,000-vector corpus — the testdata
  * ships no sf1, so the corpus is the REAL sf0.1 `embeddings` table
  * (2,000 rows, 64 dims) times ten deterministic low-amplitude jitter
  * replicas (amplitude 0.02 on unit-scale dims, seeded by
  * (id, dim, replica) — reproducible bit-for-bit, and the replicas are
  * genuine near-neighbors, which makes the top-10 frontier HARDER than
  * the raw table, not easier). Not an oracle query: the output is a
  * committed JSON artifact (`tools/ann_recall_sf1.json`) read by
  * BENCH_NOTES.md.
  *
  *   runMain graft.AnnRecall /root/testdata/sf0.1 tools/ann_recall_sf1.json
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("tools/ann_recall_sf1.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, out) finally spark.stop()
  }

  private def run(spark: SparkSession, sfDir: String, out: String): Unit = {
    val root = "/tmp/graft_fix/ann_recall_sf1"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    // ×10: replica j shifts ids by j·100k and jitters every dim by
    // 0.02·sin(id·64 + dim + j·7919) — deterministic, no RNG state
    val corpus = (0 until 10).map { j =>
      if (j == 0) e
      else e.select(
        (col("vec_id") + lit(j * 100000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + lit(0.02) * sin(col("vec_id") * 64 + i + lit(j * 7919)))
          .as("embedding"))
    }.reduce(_ unionByName _)
      .withColumn("label", lit(0))
      .persist()
    val n = corpus.count()

    val vs = graft.ext.VectorStore
    vs.initPq(graft.ext.Similarity.pqTrain(e), root) // codebook: real rows
    val k = 64 // coarse cells for a 20k corpus (~312 rows/cell)
    (0 until 4).foreach(b =>
      vs.appendCommitted(corpus.where(col("vec_id") % 4 === b), root,
        s"b$b", k = k))

    // 25 probe queries: real vectors, spread across the id range
    val queries = e.where(col("vec_id") % 80 === 3)
      .orderBy("vec_id").limit(25)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    require(queries.length == 25, s"got ${queries.length} queries")

    def truthTop10(qid: Long, q: Seq[Double]): Set[Long] = {
      val qCol = array(q.map(lit): _*)
      corpus.where(col("vec_id") =!= qid)
        .withColumn("cos", graft.ext.Similarity.cosine(col("embedding"), qCol))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10).select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val truths = queries.map { case (qid, q) => qid -> truthTop10(qid, q) }.toMap

    def recall(got: DataFrame, qid: Long): Double =
      got.select("vec_id").collect().map(_.getLong(0)).toSet
        .intersect(truths(qid)).size / 10.0

    def avg(f: (Long, Seq[Double]) => DataFrame): Double = {
      val rs = queries.map { case (qid, q) => recall(f(qid, q), qid) }
      rs.sum / rs.length
    }

    val floatByNprobe = Seq(1, 2, 4, 8, 16).map { np =>
      np -> avg((qid, q) => vs.search(spark, root, q, nprobe = np,
        topK = 10, excludeId = Some(qid)))
    }
    val q8 = Seq(4, 8).map { np =>
      np -> avg((qid, q) => vs.searchQuantized(spark, root, q, nprobe = np,
        topK = 10, rerank = 4, excludeId = Some(qid)))
    }
    val pq = Seq(4, 8).map { np =>
      np -> avg((qid, q) => vs.searchPq(spark, root, q, nprobe = np,
        topK = 10, rerank = 4, excludeId = Some(qid)))
    }

    // ---- RECALL UNDER CHURN (VERDICT r18 stretch #7): delete 30% of
    // the corpus, append a SHIFTED batch the frozen centroids were
    // never trained on (a genuine distribution drift — assignments
    // land in the old cells), measure the degraded curve, RETRAIN
    // through the maintenance path ([[graft.ext.VectorStore.retrain]],
    // the `vector_store_retrain` op), and measure again vs ground
    // truth recomputed on the post-churn corpus. Evidence the
    // maintenance path preserves the recall curve, not just the
    // search path.
    val delPred = "vec_id % 10 < 3"
    graft.ext.ManifestTable.deleteWhere(spark, root, delPred, "churn-del")
    val shifted = (10 until 13).map { jr =>
      e.select((col("vec_id") + lit(jr * 100000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + lit(0.3) * cos(col("vec_id") * 31 + i + lit(jr)))
          .as("embedding"))
    }.reduce(_ unionByName _).withColumn("label", lit(0))
    require(vs.appendCommitted(shifted, root, "churn-add", k = k),
      "churn append did not commit")
    val driftPre = vs.driftStats(spark, root)
    val corpus2 = corpus.where(not(expr(delPred)))
      .unionByName(shifted).persist()
    val n2 = corpus2.count()
    corpus.unpersist()
    def truth2Top10(qid: Long, q: Seq[Double]): Set[Long] = {
      val qCol = array(q.map(lit): _*)
      corpus2.where(col("vec_id") =!= qid)
        .withColumn("cos", graft.ext.Similarity.cosine(col("embedding"), qCol))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10).select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val truths2 = queries.map { case (qid, q) => qid -> truth2Top10(qid, q) }.toMap
    def avg2(f: (Long, Seq[Double]) => DataFrame): Double = {
      val rs = queries.map { case (qid, q) =>
        f(qid, q).select("vec_id").collect().map(_.getLong(0)).toSet
          .intersect(truths2(qid)).size / 10.0 }
      rs.sum / rs.length
    }
    val preRetrain = Seq(2, 4, 8).map { np =>
      np -> avg2((qid, q) => vs.search(spark, root, q, nprobe = np,
        topK = 10, excludeId = Some(qid)))
    }
    require(vs.retrain(spark, root, "churn-retrain", k = k, iters = 2,
      filesOut = k), "retrain did not commit")
    val driftPost = vs.driftStats(spark, root)
    // 32/64 too: the post-churn 10th truth neighbor is a FAR row (the
    // shifted cluster, cos ~0.58 vs the ~0.99 twins) whose tight
    // post-retrain cell ranks beyond the near-probe set — the curve
    // must be shown closing to 1.0 at full probe, or the plateau reads
    // as a maintenance-path loss (it is not; verified row-complete)
    val postRetrain = Seq(1, 2, 4, 8, 16, 32, 64).map { np =>
      np -> avg2((qid, q) => vs.search(spark, root, q, nprobe = np,
        topK = 10, excludeId = Some(qid)))
    }
    // ---- PLATEAU DIAGNOSIS (VERDICT r19 #5): which queries still
    // miss truth rows at nprobe=32, and at what CENTROID-DISTANCE
    // RANK (the probe order) each missing row's ASSIGNED cell sits
    // for that query. A rank beyond the probe budget is INHERENT to
    // single-assignment IVF: soft assignment or a second probe table
    // reorders NEAR-BOUNDARY cells, neither can promote a cell whose
    // centroid is genuinely far from the query — only probing deeper
    // (the curve closing at 64) reaches it. A rank INSIDE the budget
    // would instead indict the probe order. The emitted ranks decide.
    val centsArr = vs.readCentroids(spark, root).get.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def l2sq(cv: Array[Double], q: Seq[Double]): Double =
      cv.zip(q).foldLeft(0.0) { case (a, (x, y)) => a + (x - y) * (x - y) }
    val plateauNp = 32
    val misses = queries.flatMap { case (qid, q) =>
      val got = vs.search(spark, root, q, nprobe = plateauNp, topK = 10,
        excludeId = Some(qid)).select("vec_id").collect()
        .map(_.getLong(0)).toSet
      val probeOrder = centsArr.map { case (cid, cv) => (cid, l2sq(cv, q)) }
        .sortBy { case (cid, dd) => (dd, cid) }.map(_._1)
      (truths2(qid) -- got).toSeq.sorted.map { mid =>
        val cell = graft.ext.ManifestTable.readWhere(spark, root,
            s"vec_id = $mid").select("centroid_id").head().getLong(0)
        val rank = probeOrder.indexOf(cell) + 1
        val qCol = array(q.map(lit): _*)
        val cosToQ = corpus2.where(col("vec_id") === mid)
          .select(graft.ext.Similarity.cosine(col("embedding"), qCol))
          .head().getDouble(0)
        (qid, mid, rank, cosToQ)
      }
    }
    corpus2.unpersist()

    def j(pairs: Seq[(Int, Double)]): String =
      pairs.map { case (np, r) => s""""$np":${f"$r%.4f"}""" }.mkString("{", ",", "}")
    val json =
      s"""{"corpus_rows":$n,"dims":64,"cells":$k,"queries":${queries.length},
         |"note":"sf0.1 embeddings x10 deterministic jitter replicas; recall@10 vs brute-force cosine",
         |"float_recall_at_10_by_nprobe":${j(floatByNprobe)},
         |"q8_rerank4_recall_at_10_by_nprobe":${j(q8)},
         |"pq_rerank4_recall_at_10_by_nprobe":${j(pq)},
         |"churn":{"note":"delete 30% + append 3 shifted replicas (old centroids), then retrain",
         |"corpus_rows":$n2,
         |"mean_sq_dist_pre_retrain":${f"${driftPre.meanSqDist}%.4f"},
         |"mean_sq_dist_post_retrain":${f"${driftPost.meanSqDist}%.4f"},
         |"pre_retrain_recall_at_10_by_nprobe":${j(preRetrain)},
         |"post_retrain_recall_at_10_by_nprobe":${j(postRetrain)},
         |"plateau_diagnosis":{"nprobe":$plateauNp,
         |"stuck_queries":${misses.map(_._1).distinct.length},
         |"misses":[${misses.map { case (qid, mid, rank, c) =>
             s"""{"qid":$qid,"missing_vec_id":$mid,"cell_probe_rank":$rank,""" +
               f""""cos_to_query":$c%.4f}""" }.mkString(",")}],
         |"note":"cell_probe_rank = position of the missing row's assigned cell in the query's centroid-distance probe order; ranks beyond 32 mean no probe ORDERING (soft assignment, second table) reaches the row without probing deeper — the far shifted-cluster 10th neighbors, inherent to single-assignment IVF at this cell count; ranks <= 32 would instead indict the probe order"}}}""".stripMargin
      .replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(json)
  }
}
