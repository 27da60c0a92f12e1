package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Centroid-partitioned vector store — the PERSISTENCE layer under the
  * IVF search family: vectors land in parquet partitioned by their
  * coarse-quantizer cell (`centroid_id=<c>/` directories), so a search
  * probing `nprobe` cells is a PARTITION-PRUNED scan reading nprobe/k of
  * the corpus from disk — the listing never touches the other
  * directories (the spec pins `PartitionFilters` in the executed plan).
  * At 100 TB this is the difference between an ANN query costing a full
  * corpus scan and costing only its probed cells; the same layout serves
  * batch backfill and a streaming `foreachBatch(append)` sink.
  *
  * Centroids FREEZE at store creation (the first append seeds them from
  * its k lowest-id vectors, the same seeding as [[Similarity.withCell]];
  * pass pre-trained [[Similarity.kmeansCentroids]] output via `init` for
  * trained cells) and persist under `_centroids` — an underscore path,
  * invisible to the partitioned read. Every later append assigns
  * against the SAME centroids, so cells stay consistent across appends
  * and the assignment is a broadcast projection over the batch — no
  * shuffle, O(batch) per append. Re-clustering is a rebuild into a new
  * store directory (standard for IVF indexes — cell identity IS the
  * physical layout).
  */
object VectorStore {

  private def centroidsPath(dir: String) = s"$dir/_centroids"

  private def hadoopFs(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  /** The store's frozen centroids (cid, cv), or None before creation. */
  def readCentroids(spark: SparkSession, dir: String): Option[DataFrame] = {
    val fs = hadoopFs(spark, dir)
    if (fs.exists(new org.apache.hadoop.fs.Path(centroidsPath(dir))))
      Some(spark.read.parquet(centroidsPath(dir)))
    else None
  }

  /** Create the store with explicit centroids — (cid, cv) as produced by
    * [[Similarity.kmeansCentroids]], or any frame with those columns.
    */
  def init(centroids: DataFrame, dir: String): Unit =
    centroids.select(col("cid").cast("long").as("cid"), col("cv"))
      .write.mode("errorifexists").parquet(centroidsPath(dir))

  /** Append a batch of vectors. The first append on an uninitialized
    * store seeds centroids from its `k` lowest-id vectors (deterministic
    * and oracle-replayable); later appends ignore `k` and assign against
    * the frozen centroids.
    */
  def append(vecs: DataFrame, dir: String, k: Int = 16,
             idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = vecs.sparkSession
    val cents = readCentroids(spark, dir).getOrElse {
      init(vecs.filter(col(idCol) < k)
        .select(col(idCol).cast("long").as("cid"),
          transform(col(vecCol), x => x.cast("double")).as("cv")), dir)
      readCentroids(spark, dir).get
    }
    Similarity.assignTo(vecs, cents, vecCol)
      .write.partitionBy("centroid_id").mode("append").parquet(dir)
  }

  /** Compact every cell's accumulated small append files in place —
    * [[Compact.compactParquet]] per `centroid_id=` leaf directory (the
    * flat-layout rule applies per LEAF of a partitioned table; whole-
    * table compaction would flatten the cells). Same concurrency
    * contract as Compact: an append landing mid-compaction survives.
    * Returns (input files, output files) summed over cells.
    */
  def compactCells(spark: SparkSession, dir: String,
                   targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val fs = hadoopFs(spark, dir)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("centroid_id="))
      .map(s => Compact.compactParquet(spark, s.getPath.toString, targetFileBytes))
      .foldLeft((0, 0)) { case ((a, b), (x, y)) => (a + x, b + y) }
  }

  /** Top-`topK` cosine neighbors of `q` among the vectors in its
    * `nprobe` nearest cells (squared-L2 cell ranking, cid tiebreak —
    * the [[Similarity]] convention). The scan is partition-pruned to
    * those cells; ties in the final cut break by ascending id. Emits
    * (idCol, cos6).
    */
  def search(spark: SparkSession, dir: String, q: Seq[Double],
             nprobe: Int = 2, topK: Int = 10,
             idCol: String = "vec_id", vecCol: String = "embedding",
             excludeId: Option[Long] = None): DataFrame = {
    val cents = readCentroids(spark, dir).getOrElse(
      throw new IllegalStateException(s"no vector store at $dir")).collect()
    def l2sq(cv: Seq[Double]): Double =
      cv.zip(q).foldLeft(0.0) { case (a, (x, y)) => a + (x - y) * (x - y) }
    val cells = cents
      .map(r => (r.getLong(0), l2sq(r.getSeq[Double](1))))
      .sortBy { case (cid, d) => (d, cid) }
      .take(nprobe).map(_._1)
    val qCol = array(q.map(lit): _*)
    val base = spark.read.parquet(dir)
      .filter(col("centroid_id").isin(cells: _*))
    excludeId.fold(base)(i => base.filter(col(idCol) =!= i))
      .withColumn("cos", Similarity.cosine(col(vecCol), qCol))
      .orderBy(col("cos").desc, col(idCol))
      .limit(topK)
      .select(col(idCol), round(col("cos"), 6).as("cos6"))
  }
}
