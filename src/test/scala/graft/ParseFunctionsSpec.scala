package graft

import org.apache.spark.sql.functions._
import graft.functions.{ParseFunctions, TextFunctions}

/** The parse/repair cascade against the reference's own pathological
  * response formats (FIXTURES.md §4a; testing/test_parsing.py:109-131).
  */
class ParseFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(content: String): Map[String, String] = {
    val r = Seq(content).toDF("content")
      .select(ParseFunctions.parseCascade(col("content")).as("m"))
      .as[Map[String, String]].head()
    if (r == null) Map.empty else r
  }

  private val telugu = "ఫ్యూయల్ డెలివరీ ప్రెజర్ సెన్సార్"

  test("1: clean JSON map") {
    assert(parse(s"""{"21": "$telugu", "27": "rather healthy value"}""") ==
      Map("21" -> telugu, "27" -> "rather healthy value"))
  }

  test("2: markdown-fenced JSON") {
    assert(parse(s"```json\n{\"21\": \"$telugu\"}\n```") == Map("21" -> telugu))
  }

  test("3: truncated fenced JSON recovers complete pairs via brace repair") {
    val truncated = "```json\n{\"21\": \"value twenty one\", \"27\": \"value twen"
    assert(parse(truncated) == Map("21" -> "value twenty one"))
  }

  test("4: desc_-prefixed lines") {
    assert(parse("desc_21. first translated value\ndesc_27. second translated value") ==
      Map("21" -> "first translated value", "27" -> "second translated value"))
  }

  test("5: numbered tuple lines") {
    assert(parse("320. ('640', 'tuple style value')\n321. ('641', 'another tuple value')") ==
      Map("640" -> "tuple style value", "641" -> "another tuple value"))
  }

  test("6: bare json-ish lines") {
    assert(parse("\"21\": \"line style value one\",\n\"27\": \"line style value two\"") ==
      Map("21" -> "line style value one", "27" -> "line style value two"))
  }

  test("7: suspicious values are rejected during parse") {
    val m = parse("""{"1": "null", "2": "error", "3": "ok", "4": "42", "5": "a proper value"}""")
    assert(m == Map("5" -> "a proper value"))
  }

  test("8: empty / null content parses to nothing") {
    assert(parse("") == Map.empty)
    assert(parse("   ") == Map.empty)
  }

  test("9: duplicate ids within a response — last wins") {
    assert(parse("\"21\": \"first value here\",\n\"21\": \"second value wins\"") ==
      Map("21" -> "second value wins"))
  }

  test("10: unparseable garbage yields null map, not an exception") {
    assert(parse("complete nonsense with no structure") == Map.empty)
  }

  test("repairJsonS appends missing braces") {
    assert(ParseFunctions.repairJsonS("""{"a": "value number one"""") ==
      """{"a": "value number one"}""")
  }

  test("repairJsonS truncates to last complete pair") {
    val s = """{"a": "first full value", "b": "second full value", "c": "cut off he"""
    val repaired = ParseFunctions.repairJsonS(s)
    assert(repaired.contains("first full value") && repaired.contains("second full value"))
    assert(!repaired.contains("cut off"))
  }

  test("parseOutcome classifies strategies") {
    val df = Seq(
      """{"1": "clean json value"}""",
      "```json\n{\"1\": \"fenced value ok\"}\n```",
      "{\"1\": \"complete value here\", \"2\": \"truncated json val",
      "desc_1. fallback line value",
      "total garbage").toDF("content")
      .select(ParseFunctions.parseOutcome(col("content")).as("o"))
    assert(df.as[String].collect().toSeq ==
      Seq("parsed_json", "parsed_json", "repaired", "fallback_lines", "unparseable"))
  }

  test("11: F4 — prose around a fenced block, only inside lines kept") {
    val content =
      s"Sure! Here is the translation you asked for:\n```\n{\"21\": \"$telugu\"}\n```\nLet me know if you need more."
    assert(parse(content) == Map("21" -> telugu))
  }

  test("12: F4 — multi-line JSON inside the fence survives") {
    val content =
      "intro text\n```json\n{\"21\": \"value one here\",\n\"27\": \"value two here\"}\n```\ntrailing text"
    assert(parse(content) == Map("21" -> "value one here", "27" -> "value two here"))
  }

  test("13: F5 — JSON wrapped in stray quotes") {
    assert(parse("\"{\"21\": \"quoted wrapper value\"}\"") ==
      Map("21" -> "quoted wrapper value"))
  }

  test("14: F4 falls back to basic strip when nothing is inside fences") {
    // no fence lines at all → keepInsideFences must not eat the content
    assert(parse(s"""{"21": "$telugu"}""") == Map("21" -> telugu))
  }

  test("15: indented json-ish lines reach the line fallback (ADVICE r1)") {
    assert(parse("  \"21\": \"indented line value\",\n  \"27\": \"second indented value\",") ==
      Map("21" -> "indented line value", "27" -> "second indented value"))
  }

  test("truncation detection (F8)") {
    val df = Seq("{\"a\": \"b\"", "```json\n{}", "{\"a\": \"b\"}").toDF("c")
      .select(TextFunctions.isTruncated(col("c")).as("t"))
    assert(df.as[Boolean].collect().toSeq == Seq(true, true, false))
  }
}
