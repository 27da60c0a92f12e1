package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (north-star brief): brute-force cosine as
  * the exact baseline, and a hyperplane-LSH bucketed variant as the scale
  * path (Charikar '02 SimHash for vectors).
  *
  * All arithmetic is float→double cast followed by a LEFT-TO-RIGHT fold,
  * so a SQL engine replaying the same fold produces bit-identical IEEE
  * doubles — cosine values can be hash-compared exactly, no tolerance.
  *
  * Scale design: brute force is one broadcast of the query vector and a
  * single scan (fine for one query over any corpus; top-k plans as
  * TakeOrderedAndProject, no global sort materialization). For
  * query-heavy workloads, `bucket` pre-partitions the corpus by LSH
  * bucket so a query probes ~1/2^bits of the data; buckets are stable,
  * persistable columns, so the index is just a partitioned/bucketed table.
  */
object Similarity {

  /** Left-to-right dot product of two float-array columns, in doubles. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane component for (plane i, dim j):
    * an LCG-ish integer formula both Spark and any SQL engine evaluate
    * identically — no RNG state, no hidden seed.
    */
  private def planeCoef(i: Int, j: Column): Column =
    ((j * lit(2654435761L) + lit(i.toLong * 40503L)) % 1009 - 504).cast("double")

  /** Sign bit of v · r_i for hyperplane i. */
  def planeBit(v: Column, i: Int, dims: Int): Column = {
    val prods = zip_with(v, sequence(lit(0L), lit(dims.toLong - 1)),
      (x, j) => x.cast("double") * planeCoef(i, j))
    (aggregate(prods, lit(0.0), (acc, p) => acc + p) > 0).cast("long")
  }

  /** LSH bucket id: `bits` hyperplane sign bits packed into a long.
    * 2^bits buckets; cosine-close vectors collide with high probability.
    */
  def bucket(v: Column, bits: Int = 6, dims: Int = 64): Column =
    (0 until bits).map(i => planeBit(v, i, dims) * (1L << i))
      .reduce(_ + _)

  /** Exact cosine of every row against one query vector (brute force).
    * The 1-row query side is broadcast — no shuffle of the corpus.
    */
  def cosineToQuery(embeddings: DataFrame, queryId: Long,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val q = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"))
    embeddings.join(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), cosine(col(vecCol), col("q_vec")).as("cos"))
  }

  /** Brute-force top-k: plans as TakeOrderedAndProject (per-partition
    * heap + driver merge of k rows), not a global sort.
    */
  def topK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame =
    cosineToQuery(embeddings, queryId)
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)

  /** Left-to-right squared L2 distance in doubles (SQL-replayable). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** IVF-style coarse quantization: assign every vector to its nearest
    * centroid (squared L2, centroid id breaks ties). The first k vectors
    * serve as fixed centroids — a deterministic stand-in for k-means
    * training; the index mechanics (broadcast centroids, one scan, cell
    * assignment as a persistable partition column) are the real thing.
    *
    * Scale: centroids broadcast (k rows), assignment is one scan +
    * k-way comparison per row — no shuffle; the cell column then drives
    * partitioned/bucketed layout so queries touch 1/k of the corpus.
    */
  def ivfAssign(embeddings: DataFrame, k: Int = 16,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val centroids = embeddings.filter(col(idCol) < k)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("c_vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("dist2"), col("centroid_id"))
    embeddings.join(broadcast(centroids))
      .withColumn("dist2", l2sq(col(vecCol), col("c_vec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("centroid_id"))
  }

  /** IVF search with nprobe=1: cosine against every vector in the query's
    * cell only.
    */
  def ivfSearch(embeddings: DataFrame, queryId: Long, k: Int = 16): DataFrame = {
    val assign = ivfAssign(embeddings, k)
    val qCell = assign.filter(col("vec_id") === queryId)
      .select(col("centroid_id").as("q_cell"))
    val qVec = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_vec"))
    embeddings.join(assign, "vec_id")
      .join(broadcast(qCell)).filter(col("centroid_id") === col("q_cell"))
      .join(broadcast(qVec))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), cosine(col("embedding"), col("q_vec")).as("cos"))
  }

  /** Bucket-restricted search: probe only the query's LSH bucket. */
  def bucketedSearch(embeddings: DataFrame, queryId: Long,
                     bits: Int = 6, dims: Int = 64): DataFrame = {
    val withBucket = embeddings.withColumn("bucket",
      bucket(col("embedding"), bits, dims))
    val q = withBucket.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_vec"), col("bucket"))
    withBucket.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), cosine(col("embedding"), col("q_vec")).as("cos"))
  }
}
