package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analysis, Tracking}

class TrackingAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def trackingRows = Seq(
    // (batch_id, input_file, job_id, status, timestamp, lang, output_file)
    ("b1", "a.csv", "batch_1", "submitted", 100L, "te", null),
    ("b1", "b.csv", "batch_2", "submitted", 101L, "te", null),
    (null, null, "batch_1", "in_progress", 200L, null, null),
    (null, null, "batch_1", "completed", 300L, null, "out_1.csv"),
    (null, null, "batch_2", "failed", 250L, null, null)
  ).toDF("batch_id", "input_file", "job_id", "status", "timestamp",
    "target_language", "output_file")

  test("S9 append + readLog round trip accumulates both writes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_trk").toString + "/log"
    Tracking.append(trackingRows.filter($"timestamp" < 200), dir)
    Tracking.append(trackingRows.filter($"timestamp" >= 200), dir)
    val log = Tracking.readLog(spark, dir)
    assert(log.count() === 5)
    assert(log.schema.fieldNames.toSeq === graft.core.Schemas.tracking.fieldNames.toSeq)
  }

  test("S10 latestState merges partial updates per job, keeping seed columns") {
    val state = Tracking.latestState(trackingRows, col("timestamp"))
      .orderBy("job_id").collect()
    assert(state.length === 2)
    val j1 = state(0)
    assert(j1.getAs[String]("job_id") === "batch_1")
    assert(j1.getAs[String]("status") === "completed")
    // batch_id/input_file survive from the seed row even though updates
    // carried nulls (the reference updates columns in place)
    assert(j1.getAs[String]("batch_id") === "b1")
    assert(j1.getAs[String]("input_file") === "a.csv")
    assert(j1.getAs[String]("output_file") === "out_1.csv")
    assert(j1.getAs[Long]("timestamp") === 300L)
    val j2 = state(1)
    assert(j2.getAs[String]("status") === "failed")
    assert(j2.getAs[String]("output_file") === null)
  }

  test("S10 incremental upsert folds batches to the full-log compaction, idempotently") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ups").toString + "/state"
    // batch 1: seed rows; batch 2: the partial updates — arrival order
    // follows timestamps, the streaming sink's normal shape
    Tracking.upsert(trackingRows.filter($"timestamp" < 200), dir)
    Tracking.upsert(trackingRows.filter($"timestamp" >= 200), dir)
    def snap() = Tracking.readState(spark, dir).orderBy("job_id")
      .collect().map(_.toSeq).toSeq
    val folded = snap()
    // incremental fold == one-shot compaction of the whole log
    val oneShot = Tracking.latestState(trackingRows, col("timestamp"))
      .orderBy("job_id").collect().map(_.toSeq).toSeq
    assert(folded === oneShot)
    // seed columns survive partial updates; the update columns won
    val j1 = Tracking.readState(spark, dir).filter($"job_id" === "batch_1").collect()(0)
    assert(j1.getAs[String]("status") === "completed")
    assert(j1.getAs[String]("batch_id") === "b1")
    assert(j1.getAs[String]("output_file") === "out_1.csv")
    // idempotent: re-applying the last micro-batch (the post-crash replay
    // foreachBatch must tolerate) changes nothing
    Tracking.upsert(trackingRows.filter($"timestamp" >= 200), dir)
    assert(snap() === folded)
    // and an upsert of a strictly newer partial record advances the state
    Tracking.upsert(Tracking.statusUpdate(spark, "batch_2", "completed", 400L,
      Some("out_2.csv")), dir)
    val j2 = Tracking.readState(spark, dir).filter($"job_id" === "batch_2").collect()(0)
    assert(j2.getAs[String]("status") === "completed")
    assert(j2.getAs[String]("output_file") === "out_2.csv")
    assert(j2.getAs[String]("batch_id") === "b1")  // kept from the seed
  }

  test("P4 status filter over compacted state") {
    val state = Tracking.latestState(trackingRows, col("timestamp"))
    assert(Tracking.withStatus(state, "completed").count() === 1)
    assert(Tracking.withStatus(state, "submitted").count() === 0)
  }

  private def responses = Seq(
    ("b1", 200, """{"1": "good value"}""", null),               // parsed_json
    ("b2", 200, "```json\n{\"2\": \"fenced value\"}\n```", null), // parsed_json
    ("b3", 200, """{"3": "alpha beta", "4": "trunc""", null),   // repaired
    ("b4", 200, "5. line style value", null),                   // fallback_lines
    ("b5", 200, "", null),                                      // empty_content
    ("b6", 200, "<<<garbage>>>", null),                         // unparseable
    ("b7", 200, null, null),                                    // missing_content
    ("b8", 500, """{"8": "never mind"}""", "server error")      // http_error
  ).toDF("custom_id", "status_code", "content", "error")

  test("A4 classify routes every pathology to its bucket") {
    val got = Analysis.classify(responses)
      .select("custom_id", "outcome").as[(String, String)].collect().toMap
    assert(got === Map(
      "b1" -> "parsed_json", "b2" -> "parsed_json", "b3" -> "repaired",
      "b4" -> "fallback_lines", "b5" -> "empty_content",
      "b6" -> "unparseable", "b7" -> "missing_content", "b8" -> "http_error"))
  }

  test("A4 rollup counts and percentages") {
    val roll = Analysis.rollup(responses)
      .select("outcome", "n", "pct").as[(String, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(roll("parsed_json") === ((2L, 25.0)))
    assert(roll("repaired") === ((1L, 12.5)))
  }

  test("A4 summary derived rates match the reference formulas") {
    val s = Analysis.summary(responses).collect()(0)
    assert(s.getAs[Long]("total") === 8L)
    assert(s.getAs[Long]("successful") === 2L)
    assert(s.getAs[Long]("repaired") === 1L)
    assert(s.getAs[Long]("fallback") === 1L)
    assert(s.getAs[Long]("failed") === 4L)
    assert(s.getAs[Double]("success_rate") === 25.0)
    // repaired / (repaired + fallback + unparseable) = 1/3
    assert(s.getAs[Double]("repair_rate") === 33.33)
    assert(s.getAs[Double]("effective_success_rate") === 50.0)
  }
}
