package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

class CliSpec extends SparkSpec {
  import spark.implicits._

  test("translate mode writes the 3-column CSV plus reports") {
    val dir = Files.createTempDirectory("graft-cli").toString
    Files.writeString(Paths.get(s"$dir/in.csv"),
      "description_id,english_sentence\nP1,first fault code here\nP2,second fault code here\n")
    Cli.run(spark, Array("translate", s"$dir/in.csv", s"$dir/out"))
    val out = spark.read.option("header", "true").csv(s"$dir/out/translated")
    assert(out.count() === 2)
    assert(out.columns.toSeq ===
      Seq("description_id", "english_sentence", "translated_sentence"))
    assert(Files.exists(Paths.get(s"$dir/out/reports/summary")))
  }

  test("analyze mode rolls up a response JSONL and writes the repaired copy") {
    val dir = Files.createTempDirectory("graft-cli").toString
    val flat = Seq(
      ("batch-0001", 200, """{"1": "healthy value"}""", null),
      ("batch-0002", 200, """{"2": "good start", "3": "trunc""", null),
      ("batch-0003", 500, null, "boom")).toDF(
      "custom_id", "status_code", "content", "error")
    sources.JsonlIO.toResponseEnvelope(flat)
      .write.mode("overwrite").json(s"$dir/resp")
    Cli.run(spark, Array("analyze", s"$dir/resp", s"$dir/out"))
    val rollup = spark.read.option("header", "true").csv(s"$dir/out/rollup")
    val outcomes = rollup.select("outcome").as[String].collect().toSet
    assert(outcomes.contains("parsed_json") && outcomes.contains("repaired"))
    val repaired = sources.JsonlIO.readResponses(spark, s"$dir/out/repaired")
      .filter(col("custom_id") === "batch-0002")
      .select("content").as[String].head()
    assert(repaired === """{"2": "good start"}""")
  }

  test("folder mode writes per-stem partitions") {
    val dir = Files.createTempDirectory("graft-cli").toString
    Files.createDirectories(Paths.get(s"$dir/in"))
    Files.writeString(Paths.get(s"$dir/in/a.csv"),
      "description_id,english_sentence\nA1,alpha sentence text\n")
    Files.writeString(Paths.get(s"$dir/in/b.csv"),
      "description_id,english_sentence\nB1,beta sentence text\n")
    Cli.run(spark, Array("folder", s"$dir/in", s"$dir/out"))
    val out = spark.read.option("header", "true")
      .csv(s"$dir/out/translated")
    assert(out.count() === 2)
    assert(Files.list(Paths.get(s"$dir/out/translated")).toArray
      .map(_.toString).exists(_.contains("source_stem=a")))
  }

  test("bad arity fails with the usage string, not a MatchError (ADVICE r2)") {
    val ex = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("translate", "only-one-path"))
    }
    assert(ex.getMessage.contains("usage:"))
    val ex2 = intercept[IllegalArgumentException] {
      Cli.run(spark, Array("nonsense", "a", "b"))
    }
    assert(ex2.getMessage.contains("usage:"))
  }
}
