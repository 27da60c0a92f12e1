package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.util.matching.Regex

/** The response-content parse/repair cascade (SURVEY.md §2.8 F6-F12),
  * modeling auto_translate.py:410-901: LLM batch responses arrive as a JSON
  * map `{description_id: translation}` wrapped in zero or more layers of
  * markdown fencing, truncation, or free-text numbering, and the engine
  * recovers as many (id → translation) pairs as possible.
  *
  * Strategy order mirrors the reference's first-success cascade
  * (auto_translate.py:498-501), expressed as `coalesce` so Catalyst
  * short-circuits left-to-right: cheap `from_json` variants first (pure
  * codegen), then the repair/fallback UDFs only on rows the cheap paths
  * rejected. All functions are deterministic so predicate pushdown stays
  * legal.
  */
object ParseFunctions {

  private val mapType = MapType(StringType, StringType)

  /** F11 — extract a fenced JSON object (auto_translate.py:796-821). */
  def extractFencedJson(c: Column): Column =
    regexp_extract(c, "(?s)```(?:json)?\\s*(\\{.*?\\})\\s*```", 1)

  /** F4 — multiline cleanup (auto_translate.py:443-466): keep only the
    * trimmed, non-empty lines INSIDE fenced blocks (each ``` line toggles
    * the state and is dropped); if nothing was inside a fence, fall back
    * to the basic strip. Expressed as a fold over the line array so it
    * stays a deterministic Column expression (no UDF).
    */
  def keepInsideFences(c: Column): Column = {
    val folded = aggregate(
      split(c, "\n"),
      struct(lit(false).as("inside"), lit("").as("out")),
      (acc, raw) => {
        val line = trim(raw)
        val fence = line.startsWith("```")
        val inside = acc.getField("inside")
        val out = acc.getField("out")
        struct(
          when(fence, !inside).otherwise(inside).as("inside"),
          when(fence || !inside || line === "", out)
            .otherwise(when(out === "", line).otherwise(concat(out, lit("\n"), line)))
            .as("out"))
      },
      acc => acc.getField("out"))
    when(folded =!= "", folded).otherwise(TextFunctions.stripFencesBasic(c))
  }

  /** F5 — unicode/quote cleanup (auto_translate.py:469-487): basic strip,
    * shave stray leading/trailing quote characters, then wrap `{`/`}`
    * around object-looking text (has a ':' but no opening brace).
    */
  def cleanupQuotesAndBraces(c: Column): Column = {
    val basic = TextFunctions.stripFencesBasic(c)
    val shaved = regexp_replace(regexp_replace(basic, "^\\s*['\"]+", ""), "['\"]+\\s*$", "")
    val opened = when(!shaved.startsWith("{") && shaved.contains(":"),
      concat(lit("{"), shaved)).otherwise(shaved)
    TextFunctions.wsTrim(when(opened.startsWith("{") && !opened.endsWith("}"),
      concat(opened, lit("}"))).otherwise(opened))
  }

  /** F6 — multi-strategy JSON-map parse (auto_translate.py:490-534), in
    * the reference's cascade order: direct → basic fence strip (F2) →
    * aggressive strip (F3) → keep-inside-fences (F4) → quote/brace
    * cleanup (F5) → fenced extract (F11). `from_json` yields null on
    * malformed input — exactly the reference's try/except semantics —
    * and `coalesce` short-circuits left-to-right.
    */
  def parseJsonMap(c: Column): Column = coalesce(
    from_json(c, mapType),
    from_json(TextFunctions.stripFencesBasic(c), mapType),
    from_json(TextFunctions.stripFencesAggressive(c), mapType),
    from_json(keepInsideFences(c), mapType),
    from_json(cleanupQuotesAndBraces(c), mapType),
    from_json(extractFencedJson(c), mapType))

  // ------------------------------------------------------------- Scala side

  /** P3 as plain Scala, for use inside UDF value filtering
    * (auto_translate.py:649-672).
    */
  def isSuspiciousS(v: String): Boolean = {
    if (v == null) return true
    val t = v.trim
    t.length < 3 ||
      TextFunctions.suspiciousDenylist.contains(t.toLowerCase) ||
      t.startsWith("```") || t.startsWith("<") || t.startsWith("{") || t.startsWith("[") ||
      t.forall(_.isDigit)
  }

  private val mapper = new ObjectMapper()

  private def tryParseMap(s: String): Option[Map[String, String]] = {
    try {
      val node = mapper.readTree(s)
      if (node == null || !node.isObject) None
      else {
        val b = scala.collection.mutable.LinkedHashMap.empty[String, String]
        val it = node.fields()
        while (it.hasNext) { val e = it.next(); b(e.getKey) = e.getValue.asText() }
        Some(b.toMap)
      }
    } catch { case _: Exception => None }
  }

  /** F9 — JSON brace repair (auto_translate.py:725-793): append missing
    * closing braces; if still unparseable, truncate to the last complete
    * `"k": "v"` pair and re-close. Returns null when unrepairable.
    */
  def repairJsonS(raw: String): String = {
    if (raw == null) return null
    // F10 — unwrap an unterminated fence first (auto_translate.py:700-722)
    var s = raw.trim
      .replaceAll("^```(?:json|javascript|text)?\\s*\\n?", "")
      .replaceAll("\\n?```\\s*$", "")
      .trim
    if (s.isEmpty) return null
    val missing = s.count(_ == '{') - s.count(_ == '}')
    if (missing > 0) {
      val candidate = s + ("}" * missing)
      if (tryParseMap(candidate).isDefined) return candidate
    } else if (tryParseMap(s).isDefined) return s
    // truncate to last complete "k": "v" pair, then close
    val pair: Regex = "\"(?:[^\"\\\\]|\\\\.)*\"\\s*:\\s*\"(?:[^\"\\\\]|\\\\.)*\"".r
    val ms = pair.findAllMatchIn(s).toSeq
    if (ms.isEmpty) return null
    val upTo = s.substring(0, ms.last.end)
    val body = upTo.substring(upTo.indexOf('{') match { case -1 => 0; case i => i + 1 })
    val candidate = "{" + body.stripSuffix(",") + "}"
    if (tryParseMap(candidate).isDefined) candidate else null
  }

  /** F7 — fallback line parsing (auto_translate.py:592-646): four regex
    * patterns tried per line, first match wins; `desc_` prefixes stripped;
    * suspicious/empty values dropped; duplicate ids last-wins (A9,
    * auto_translate.py:514-518).
    */
  private val pJsonLine = """^\s*"([^"]+)"\s*:\s*"(.*?)"\s*,?\s*$""".r
  private val pTuple = """^\s*\d+\.\s*\(\s*'([^']+)'\s*,\s*'(.*?)'\s*\)\s*,?\s*$""".r
  private val pDescLine = """^\s*(?:desc_)?([A-Za-z0-9_-]+)\.\s+(.*\S)\s*$""".r

  def parseFallbackS(raw: String): Map[String, String] = {
    if (raw == null) return null
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    raw.split("\n").foreach { line =>
      val hit: Option[(String, String)] = line match {
        case pJsonLine(k, v)  => Some((k, v))
        case pTuple(k, v)     => Some((k, v))
        case pDescLine(k, v)  => Some((k.stripPrefix("desc_"), v))
        case _ => None
      }
      hit.foreach { case (k, v) =>
        val id = k.trim.stripPrefix("desc_")
        if (v.trim.nonEmpty && !isSuspiciousS(v)) out(id) = v.trim
      }
    }
    if (out.isEmpty) null else out.toMap
  }

  // -------------------------------------------------------------- Column API

  import org.apache.spark.sql.functions.udf
  private val repairJsonUdf = udf(repairJsonS _)
  private val parseFallbackUdf = udf(parseFallbackS _)

  def repairJson(c: Column): Column = repairJsonUdf(c)
  def parseFallback(c: Column): Column = parseFallbackUdf(c)

  /** Drop empty + suspicious values from a parsed map (P7 + P3 filtering
    * during parse, auto_translate.py:514-518).
    */
  def filterMapValues(m: Column): Column =
    map_filter(m, (_, v) =>
      v.isNotNull && trim(v) =!= "" && !TextFunctions.isSuspicious(v))

  /** F12 — the full auto-repair cascade (auto_translate.py:824-901):
    * cheap JSON strategies → brace repair (only if truncation is detected)
    * → free-text line fallback. Returns a filtered
    * `Map[description_id, translation]` or null.
    */
  def parseCascade(c: Column): Column = {
    val parsed = coalesce(
      parseJsonMap(c),
      when(TextFunctions.isTruncated(c), from_json(repairJson(c), mapType)),
      parseFallback(c))
    filterMapValues(parsed)
  }

  /** Which strategy recovered the row — drives the A4 error-analysis rollup
    * (auto_translate.py:1166-1181).
    */
  def parseOutcome(c: Column): Column =
    when(c.isNull, "missing_content")
      .when(trim(c) === "", "empty_content")
      .when(parseJsonMap(c).isNotNull, "parsed_json")
      .when(TextFunctions.isTruncated(c) && from_json(repairJson(c), mapType).isNotNull, "repaired")
      .when(parseFallback(c).isNotNull, "fallback_lines")
      .otherwise("unparseable")
}
