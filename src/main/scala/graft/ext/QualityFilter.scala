package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Rule-based document quality filtering with an audit trail — the
  * Gopher/Dolma-style pass that decides keep/drop per document from
  * cheap text statistics AND records WHY, because at 100 TB a filter
  * that silently deletes 30% of a corpus is indistinguishable from a
  * bug. Every rule is a named boolean Column over the text; a document's
  * `drop_reasons` is the comma-joined list of failing rules in fixed
  * rule order ("" = keep). The whole pass is a projection over the scan
  * (the ratio functions are codegen'd expressions; no UDF, no shuffle);
  * only the per-reason report aggregates.
  *
  * Default thresholds are illustrative mid-range values; real corpora
  * tune them per source. All signals come from [[TextFunctions]]'s
  * 4-decimal-rounded ratios, so decisions are exactly SQL-replayable.
  */
object QualityFilter {

  /** (name, failsPredicate) in audit order. */
  def defaultRules(text: Column): Seq[(String, Column)] = Seq(
    "empty" -> (text.isNull || length(trim(text)) === 0),
    "too_short" -> (TextFunctions.wordCount(text) < 20),
    "too_long" -> (TextFunctions.wordCount(text) > 100000),
    "stopword_ratio_low" -> (TextFunctions.stopwordRatio(text) < 0.04),
    "punct_ratio_high" -> (TextFunctions.punctRatio(text) > 0.2),
    "mean_word_len_out" -> (TextFunctions.meanWordLen(text) < 2.5 ||
      TextFunctions.meanWordLen(text) > 5.0))

  /** `docs` + (`drop_reasons`: comma-joined failing rule names, "" =
    * clean; `keep`: boolean). concat_ws skips the nulls un-failed rules
    * contribute, so the reason string assembles without any array
    * materialization.
    */
  def withQualityAudit(docs: DataFrame, textCol: String,
                       rules: Column => Seq[(String, Column)] = defaultRules)
  : DataFrame = {
    val named = rules(col(textCol)).map { case (name, fails) =>
      when(fails, lit(name))
    }
    docs
      .withColumn("drop_reasons", concat_ws(",", named: _*))
      .withColumn("keep", col("drop_reasons") === "")
  }

  /** Only the documents passing every rule. */
  def keepOnly(docs: DataFrame, textCol: String,
               rules: Column => Seq[(String, Column)] = defaultRules): DataFrame =
    withQualityAudit(docs, textCol, rules)
      .filter(col("keep")).drop("drop_reasons", "keep")

  /** The audit rollup: how many documents each rule dropped (a document
    * failing k rules counts toward all k — the report answers "what is
    * each rule doing", not "how many docs died").
    */
  def reasonReport(audited: DataFrame): DataFrame =
    audited
      .filter(col("drop_reasons") =!= "")
      .select(explode(split(col("drop_reasons"), ",")).as("reason"))
      .groupBy("reason")
      .agg(count(lit(1)).as("n"))
}
