package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function layer — the reference's string/JSON/cleanup surface
  * (SURVEY.md §2.8, F1-F20) re-expressed as pure `Column` expressions so
  * every function stays inside whole-stage codegen (no UDF boxing).
  *
  * Citations point at the behavior being modeled, e.g.
  * `/root/reference/auto_translate.py:649-672` for the suspicious
  * predicate. No code is copied; semantics only.
  */
object TextFunctions {

  /** F1 — token counting. The reference uses a BPE tokenizer
    * (auto_translate.py:259-260). The engine makes the tokenizer pluggable;
    * this is the deterministic, oracle-checkable fallback: ~4 chars/token,
    * minimum 1 for non-empty text.
    */
  def approxTokenCount(c: Column): Column =
    when(length(c) === 0, lit(0L)).otherwise(ceil(length(c) / lit(4.0)).cast("long"))

  /** F1 — regex word-ish tokenizer count (BPE-ish splitting: words,
    * numbers, and single punctuation marks each count as a token).
    */
  def regexTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Whitespace token count. */
  def wsTokenCount(c: Column): Column =
    size(split(trim(c), "\\s+")).cast("long")

  /** F1 — real BPE token count over the committed merges table (see
    * [[graft.functions.Bpe]]); closes the reference's BPE-counting gap
    * (auto_translate.py:259-260) with a native codegen expression. The
    * column resolves through the function registry (public
    * `call_function` API), so the session must have
    * `graft.plans.GraftFunctions.register` applied — all graft entry
    * points do this.
    */
  def bpeTokenCount(c: Column): Column =
    call_function("graft_bpe_token_count", c)

  /** P3 — is_suspicious_translation (auto_translate.py:649-672):
    * null, denylisted token, starts with a fence/markup char, too short,
    * or purely numeric.
    */
  val suspiciousDenylist: Seq[String] = Seq(
    "null", "none", "n/a", "na", "error", "failed", "missing", "undefined",
    "nil", "empty", "blank", "unknown", "untranslated", "todo", "tbd",
    "pending", "skip", "skipped", "not translated")

  def isSuspicious(c: Column): Column = {
    val t = trim(c)
    isnull(c) ||
      lower(t).isin(suspiciousDenylist: _*) ||
      t.rlike("^(```|<|\\{|\\[)") ||
      (length(t) < 3) ||
      t.rlike("^[0-9]+$")
  }

  /** Python-`.strip()` equivalent: Spark's `trim` removes only spaces, so
    * fence cleanup must trim ALL whitespace (newlines included) to match
    * the reference's strip() semantics.
    */
  def wsTrim(c: Column): Column = trim(c, " \t\r\n\f")

  /** F2 — basic markdown fence cleanup: strip a leading ```json / ``` line
    * and a trailing ``` line (auto_translate.py:410-423).
    */
  def stripFencesBasic(c: Column): Column = {
    val noLead = regexp_replace(c, "^\\s*```(?:json|javascript|text)?\\s*\\n?", "")
    wsTrim(regexp_replace(noLead, "\\n?```\\s*$", ""))
  }

  /** F3 — aggressive fence cleanup: remove ALL fence markers anywhere
    * (auto_translate.py:426-440).
    */
  def stripFencesAggressive(c: Column): Column =
    wsTrim(regexp_replace(c, "(?m)^\\s*```(?:json|javascript|text)?\\s*$\\n?", ""))

  /** F8 — truncation detection (auto_translate.py:678-697): an opened
    * fence that never closes, or more '{' than '}'.
    */
  def braceCount(c: Column, ch: String): Column =
    (length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(ch), ""))).cast("long")

  def isTruncated(c: Column): Column = {
    val fenceOpens = braceCount(c, "```")
    (braceCount(c, "{") > braceCount(c, "}")) ||
      (fenceOpens % 2 =!= 0)
  }

  /** F13 — custom_id formatting `batch-%04d` (auto_translate.py:311). */
  def customId(n: Column): Column = format_string("batch-%04d", n)

  /** F14 — filename stem: basename minus last extension. */
  def fileStem(path: Column): Column =
    regexp_extract(path, "([^/]+?)(?:\\.[^./]*)?$", 1)

  /** F15 — epoch seconds → display timestamp (batch_tracker.py:40-46). */
  def epochDisplay(ts: Column): Column =
    from_unixtime(ts.cast("long"), "yyyy-MM-dd HH:mm:ss")

  /** F16 — job-id extraction (batch_auto_translate.py:136-140). */
  def extractJobId(c: Column): Column =
    regexp_extract(c, "Job ID: (batch_[a-zA-Z0-9]+)", 1)

  /** F17 — numbering strip `^\d+\.\s*` (old_functionalities/testing.py:23). */
  def stripNumbering(c: Column): Column =
    regexp_replace(c, "^[0-9]+\\.\\s*", "")

  /** F18 — Telugu Unicode range check (old_functionalities/testing.py:16). */
  def hasTelugu(c: Column): Column = c.rlike("[\\u0C00-\\u0C7F]")

  /** F19 — truncate for display with ellipsis (auto_translate.py:1101). */
  def truncateDisplay(c: Column, n: Int): Column =
    when(length(c) > n, concat(substring(c, 1, n), lit("..."))).otherwise(c)

  /** Text-quality scoring for training-data pipelines: fraction of
    * alphabetic chars, punctuation ratio, stopword ratio, mean word length.
    * All pure arithmetic → identical in any ANSI SQL oracle.
    */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "this", "that")

  def wordCount(c: Column): Column = size(split(trim(c), "\\s+")).cast("long")

  def stopwordRatio(c: Column): Column = {
    val words = split(lower(trim(c)), "\\s+")
    val hits = size(filter(words, w => w.isin(stopwords: _*)))
    round(hits.cast("double") / size(words), 4)
  }

  def punctRatio(c: Column): Column =
    // regexp_count, not size(regexp_extract_all(...)): same number, no
    // per-row array of every punctuation match materialized just to count
    round(regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast("double")
      / greatest(length(c), lit(1)), 4)

  def meanWordLen(c: Column): Column = {
    val words = split(trim(c), "\\s+")
    round(aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double")
      / greatest(size(words), lit(1)), 4)
  }

  /** Document fingerprint: first 16 hex chars of md5 — a cheap, exact,
    * oracle-checkable content fingerprint (the library also has a
    * Karp-Rabin rolling hash, see ext.TextAnalysis).
    */
  def fingerprint(c: Column): Column = substring(md5(c), 1, 16)
}
