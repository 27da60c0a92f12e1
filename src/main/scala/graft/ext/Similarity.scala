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
