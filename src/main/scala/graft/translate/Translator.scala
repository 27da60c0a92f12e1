package graft.translate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Schemas

/** The external-translation boundary (SURVEY.md §2.10): the reference
  * uploads a request JSONL, polls an OpenAI batch job, and downloads a
  * response JSONL (auto_translate.py:343-389). In the engine this is a
  * pluggable service trait over DataFrames so the whole pipeline stays
  * declarative and testable offline.
  *
  * Implementations receive the request table (Schemas.request shape) and
  * return a flat response table: (custom_id, status_code, content, error).
  */
trait Translator {
  def translate(requests: DataFrame): DataFrame
}

/** Deterministic, fault-injectable mock (SURVEY §5: the env is zero-egress,
  * so tests exercise the exact response pathologies of FIXTURES.md §4a
  * without a network). The "translation" of a sentence is its tokens
  * reversed and uppercased — deterministic, unicode-safe, and visibly
  * distinct from the input.
  *
  * Fault routing is keyed on the portable 60-bit md5 hash of custom_id
  * (the same `conv(substring(md5(x),1,15),16,10)` construction the oracle
  * fixtures use) so a given batch always gets the same pathology AND any
  * SQL engine can replay the routing exactly — the `pipeline_e2e` oracle
  * derives each batch's fault mode from this hash:
  *   0 → truncated JSON (repair path, auto_translate.py:725-793)
  *   1 → markdown-fenced JSON (fence cleanup, auto_translate.py:410-440)
  *   2 → one id dropped (missing path, auto_translate.py:977-992)
  *   3 → one extra id added (extra path, auto_translate.py:1007-1009)
  *   4 → free-text "id. value" lines (fallback parser, auto_translate.py:592-646)
  *   _ → clean JSON map
  */
class MockTranslator(injectFaults: Boolean = false) extends Translator {

  override def translate(requests: DataFrame): DataFrame = {
    val userContent = element_at(col("body.messages"), 2).getField("content")
    val parsed = requests.select(
      col("custom_id"),
      from_json(userContent,
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)).as("m"))

    val translatedMap = transform_values(col("m"),
      (_, v) => upper(concat_ws(" ", reverse(split(v, " ")))))

    val cleanJson = to_json(translatedMap)
    val mode =
      if (injectFaults)
        pmod(conv(substring(md5(col("custom_id")), 1, 15), 16, 10).cast("long"),
          lit(10L))
      else lit(-1)

    val firstKey = element_at(map_keys(col("m")), 1)
    val content =
      when(mode === 0, expr("substring(clean_json, 1, greatest(12, cast(length(clean_json) * 0.6 as int)))"))
        .when(mode === 1, concat(lit("```json\n"), cleanJson, lit("\n```")))
        .when(mode === 2, to_json(map_filter(translatedMap, (k, _) => k =!= firstKey)))
        .when(mode === 3, to_json(map_concat(translatedMap,
          map(lit("ghost-id"), lit("SPURIOUS VALUE")))))
        .when(mode === 4, concat_ws("\n",
          transform(map_entries(translatedMap),
            e => concat(e.getField("key"), lit(". "), e.getField("value")))))
        .otherwise(cleanJson)

    parsed
      .withColumn("clean_json", cleanJson)
      .select(
        col("custom_id"),
        lit(200).as("status_code"),
        content.as("content"),
        lit(null).cast("string").as("error"))
  }
}

/** Adapter stub for the real OpenAI Batch API (upload → create job → poll →
  * download, auto_translate.py:343-389). Intentionally unimplemented: the
  * build environment is zero-egress; the seam exists so a deployment can
  * supply an HTTP-backed implementation without touching the engine.
  */
class OpenAIBatchTranslator extends Translator {
  override def translate(requests: DataFrame): DataFrame =
    throw new UnsupportedOperationException(
      "network translator not available in this environment; use MockTranslator")
}
