package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Schemas

/** JSONL sources/sinks for the request/response envelopes (SURVEY.md §2.1
  * S3/S4/S7/S8). Spark's json writer/reader is line-oriented JSON — exactly
  * the JSONL contract — and UTF-8 native (ensure_ascii=False equivalence).
  */
object JsonlIO {

  /** S7 — request sink (auto_translate.py:303-332). */
  def writeRequests(requests: DataFrame, path: String): Unit =
    requests.write.mode("overwrite").json(path)

  /** S4 — request scan + ordered id re-extraction
    * (check_and_process.py:38-62): recover each batch's description_id
    * list from the user message instead of trusting in-memory state.
    */
  def readRequests(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.request).json(path)

  /** The expected-rows table recovered from a request JSONL: one row per
    * (custom_id, pos, description_id, english_sentence), pos = position
    * within the batch's JSON map (insertion order preserved by from_json).
    */
  def expectedFromRequests(requests: DataFrame): DataFrame =
    requests
      .select(col("custom_id"),
        from_json(element_at(col("body.messages"), 2).getField("content"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)).as("m"))
      .select(col("custom_id"), posexplode(map_entries(col("m"))))
      .select(col("custom_id"), col("pos"),
        col("col.key").as("description_id"),
        col("col.value").as("english_sentence"))

  /** S3 — response scan: nested envelope → flat (custom_id, status_code,
    * content, error, resp_ord); a missing content path yields null, not an
    * error (auto_translate.py:392-407).
    *
    * `resp_ord` is the scan-order sequence, stamped HERE — directly over
    * the file scan, before any exchange can reorder rows — so downstream
    * last-wins resolution (A9, Reconcile.translations) ties back to
    * stable file order: a retried scan task re-reads its split in the
    * same order, whereas an id minted after a shuffle would not be
    * reproducible (ADVICE r2).
    */
  def readResponses(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.response).json(path)
      .select(
        col("custom_id"),
        col("response.status_code").as("status_code"),
        element_at(col("response.body.choices"), 1)
          .getField("message").getField("content").as("content"),
        col("error"),
        monotonically_increasing_id().as("resp_ord"))

  /** Wrap a flat (custom_id, status_code, content, error) table back into
    * the nested response envelope (for S8 repaired-JSONL round-trips).
    */
  def toResponseEnvelope(flat: DataFrame): DataFrame =
    flat.select(
      col("custom_id"),
      struct(
        col("status_code"),
        struct(array(struct(struct(col("content").as("content")).as("message")))
          .as("choices")).as("body")).as("response"),
      col("error"))

  /** S8 — repaired-JSONL sink (auto_translate.py:1493-1502): original
    * content replaced by its repaired form where repair succeeded.
    */
  def writeRepaired(flat: DataFrame, path: String): Unit = {
    val repaired = flat.withColumn("content",
      coalesce(graft.functions.ParseFunctions.repairJson(col("content")),
        col("content")))
    toResponseEnvelope(repaired).write.mode("overwrite").json(path)
  }
}
