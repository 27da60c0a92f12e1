package graft.core

import org.apache.spark.sql.types._

/** Schemas + constants for the six tables of the reference's data model
  * (SURVEY.md §1.1). Explicit StructTypes everywhere — never inferSchema —
  * and `description_id` is ALWAYS StringType (reference keys are strings
  * even when numeric-looking, auto_translate.py:518).
  */
object Schemas {

  /** Input table: description_id,english_sentence CSV (auto_translate.py:267-275). */
  val input: StructType = StructType(Seq(
    StructField("description_id", StringType, nullable = false),
    StructField("english_sentence", StringType, nullable = true),
    StructField("_corrupt_record", StringType, nullable = true)))

  /** Output table: 3-column translated CSV (auto_translate.py:941-943). */
  val output: StructType = StructType(Seq(
    StructField("description_id", StringType, nullable = false),
    StructField("english_sentence", StringType, nullable = true),
    StructField("translated_sentence", StringType, nullable = true)))

  /** Batch-request JSONL envelope (auto_translate.py:310-331). */
  val message: StructType = StructType(Seq(
    StructField("role", StringType), StructField("content", StringType)))
  val requestBody: StructType = StructType(Seq(
    StructField("model", StringType),
    StructField("messages", ArrayType(message)),
    StructField("temperature", DoubleType),
    StructField("max_tokens", IntegerType)))
  val request: StructType = StructType(Seq(
    StructField("custom_id", StringType, nullable = false),
    StructField("method", StringType),
    StructField("url", StringType),
    StructField("body", requestBody)))

  /** Batch-response JSONL (auto_translate.py:392-407; content path at 402-403). */
  val responseBody: StructType = StructType(Seq(
    StructField("choices", ArrayType(StructType(Seq(
      StructField("message", StructType(Seq(
        StructField("content", StringType))))))))))
  val response: StructType = StructType(Seq(
    StructField("custom_id", StringType, nullable = false),
    StructField("response", StructType(Seq(
      StructField("status_code", IntegerType),
      StructField("body", responseBody)))),
    StructField("error", StringType)))

  /** Job-tracking table (auto_translate.py:119-122). */
  val tracking: StructType = StructType(Seq(
    StructField("batch_id", StringType),
    StructField("input_file", StringType),
    StructField("job_id", StringType, nullable = false),
    StructField("status", StringType),
    StructField("timestamp", LongType),
    StructField("target_language", StringType),
    StructField("output_file", StringType)))

  /** Status vocabulary (BATCH_TRACKING_GUIDE.md:170-182). */
  val terminalStatuses: Set[String] = Set("completed", "failed", "download_failed")
  val statusOrder: Seq[String] = Seq(
    "submitted", "validating", "in_progress", "finalizing",
    "completed", "failed", "download_failed")

  /** Constants (auto_translate.py:31-33, 326-329, 977-981). */
  val TokenBudget: Long = 4000L
  val OutputFactor: Double = 1.8
  val FailedSentinel: String = "[TRANSLATION_FAILED]"
  val DefaultModel: String = "gpt-4o"
  val PollIntervalSec: Int = 300
}

/** Typed rows at API boundaries. */
case class InputRow(description_id: String, english_sentence: String)
case class OutputRow(description_id: String, english_sentence: String,
                     translated_sentence: String)
case class TrackingRecord(batch_id: String, input_file: String, job_id: String,
                          status: String, timestamp: Long,
                          target_language: String, output_file: String)
