package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator from SURVEY.md §2 (names
  * carry the §2 ids) or one north-star extra (dedup / similarity / text
  * analysis), expressed over the driver's testdata tables. `oracleSql`
  * holds the DuckDB-runnable equivalent; column names and ordering are
  * aligned on both sides.
  */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full translation pipeline (SURVEY §3.1): documents as the input
    * table → token-budget batching → fault-injecting mock translator →
    * parse/repair cascade → reconcile with sentinel + shift flags.
    */
  def entry(spark: SparkSession): DataFrame =
    pipelineE2E(spark, "/root/testdata/sf0.001")

  /** End-to-end engine pass over the documents table WITH fault
    * injection, fully hash-checked (VERDICT r3 "Next round" #3): pos is
    * the Ordinal two-pass global rank and the batcher runs
    * single-partition so batch composition — which the faults depend
    * on — is the sequential reference packing the oracle's recursive
    * CTE replays; the mock's
    * fault routing is a portable md5-derived mode, so the DuckDB oracle
    * derives per-entry outcomes (dropped first key, truncation cut
    * position, clean recovery) with modular arithmetic. The parallel
    * batcher path stays exercised by `e2e_clean` (boundary-insensitive
    * output) and the batching specs.
    */
  def pipelineE2E(s: SparkSession, d: String): DataFrame = {
    // global sequential pos via the two-pass Ordinal, not a global window
    // (same values; a partition-less Window would single-thread the scan)
    val input = graft.ext.Ordinal.withGlobalPos(
        t(s, d, "documents"), "doc_id")
      .select(
        col("pos"),
        col("doc_id").cast("string").as("description_id"),
        col("text").as("english_sentence"))
    val r = Pipeline.run(input,
      new graft.translate.MockTranslator(injectFaults = true), budget = 3000,
      numPartitions = 1)
    r.output
  }

  /** The same end-to-end pass with the clean (fault-free) mock translator
    * and the Ordinal-derived pos, so the whole pipeline is
    * DuckDB-replayable: the mock's reverse-words + uppercase transform is
    * SQL-expressible (VERDICT r1 "Next round" #6 — a real hash check for
    * the flagship).
    */
  def pipelineE2EClean(s: SparkSession, d: String): DataFrame = {
    val input = graft.ext.Ordinal.withGlobalPos(
        t(s, d, "documents"), "doc_id")
      .select(
        col("pos"),
        col("doc_id").cast("string").as("description_id"),
        col("text").as("english_sentence"))
    Pipeline.run(input, new graft.translate.MockTranslator(injectFaults = false),
      budget = 3000).output
  }

  // ---------------------------------------------------------------- helpers

  private def t(s: SparkSession, d: String, name: String) = Tables.load(s, d, name)

  // ---------------------------------------------------------------- queries

  /** A3 — scalar/pipeline aggregates; the TPC-H Q1 shape. */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.OpsQueries.queries ++ graft.queries.ExtQueries.queries ++ Map(
    "q1_pricing_summary" -> ((s, d) => q1PricingSummary(s, d)),

    // §3.1 — the whole engine end-to-end (batch → translate → parse →
    // reconcile); fault-injecting variant is a rows-only check, the clean
    // variant hash-matches a full DuckDB replay of the pipeline.
    "pipeline_e2e" -> ((s, d) => pipelineE2E(s, d).orderBy("pos")),
    "e2e_clean" -> ((s, d) => pipelineE2EClean(s, d).orderBy("pos")),

    // S1 — scan + blank filter + trim projection (auto_translate.py:267-275)
    "s1_scan_clean" -> ((s, d) =>
      t(s, d, "documents")
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select(col("doc_id"), trim(col("text")).as("text_clean"), col("lang"))
        .orderBy("doc_id")),

    // P3 — suspicious-translation predicate (auto_translate.py:649-672)
    "p3_suspicious" -> ((s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"),
          isSuspicious(col("p_brand")).cast("int").as("brand_suspicious"),
          isSuspicious(substring(col("p_name"), 1, 2)).cast("int").as("short_suspicious"))
        .orderBy("p_partkey")),

    // P4 — status filter (batch_tracker.py:66-80)
    "p4_status_filter" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")),

    // A1 — group-by count over status (batch_tracker.py:111-115)
    "a1_count_by_status" -> ((s, d) =>
      t(s, d, "orders").groupBy("o_orderstatus").count()
        .withColumnRenamed("count", "n").orderBy("o_orderstatus")),

    // A2 — group-by count over language (batch_tracker.py:117-120)
    "a2_count_by_lang" -> ((s, d) =>
      t(s, d, "documents").groupBy("lang").count()
        .withColumnRenamed("count", "n").orderBy("lang")),

    // J1 — reconciliation left-outer join + sentinel coalesce
    // (auto_translate.py:971-999): every order, customer name or sentinel.
    "j1_reconcile" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer").filter(col("c_custkey") % 3 =!= 0)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left_outer")
        .select(o("o_orderkey"),
          coalesce(c("c_name"), lit("[TRANSLATION_FAILED]")).as("resolved_name"))
        .orderBy("o_orderkey")
    }),

    // J4 — anti join: expected keys with no match (auto_translate.py:977-992)
    "j4_missing_anti" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // W1 — shift detection via lead() within batch in input order
    // (auto_translate.py:1012-1021)
    "w1_shift_lead" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is not unique in the testdata; order by
      // the full candidate key so the window is deterministic vs the oracle.
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
      t(s, d, "lineitem")
        .withColumn("next_qty", lead("l_quantity", 1).over(w))
        .filter(col("l_quantity") < 3 && col("next_qty") >= 25)
        .select("l_orderkey", "l_linenumber", "l_quantity", "next_qty")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "next_qty")
    }),

    // O1 — top-5 recent by timestamp desc (batch_tracker.py:132-134).
    // Ordered by the exact nanosecond epoch (ts_ns) — the micros-truncated
    // `ts` could disagree with the ns-native oracle on sub-micro ties.
    "o1_top5_recent" -> ((s, d) =>
      t(s, d, "events")
        .orderBy(col("ts_ns").desc, col("event_id").desc).limit(5)
        .select("event_id", "event_type", "value")),

    // F6 — JSON parse of props + typed extraction (auto_translate.py:490-534)
    "f6_json_extract" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") > 50)
        .orderBy("event_id")),

    // Exact dedup, scale-safe: group by the full 128-bit md5 of the text —
    // a 32-byte shuffle key instead of the whole document, with collision
    // probability ~2^-128 so no resolve step is needed (a 64-bit prefix
    // would see birthday collisions at 1e11 documents).
    "dedup_exact" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy(md5(col("text")).as("fp"))
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
        .select("doc_id", "dup_count")
        .orderBy("doc_id")),

    // Text analysis: token counts + quality signals over documents
    "text_tokens" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          wsTokenCount(col("text")).as("ws_tokens"),
          regexTokenCount(col("text")).as("re_tokens"),
          approxTokenCount(col("text")).as("approx_bpe"))
        .orderBy("doc_id")),

    // F1 — REAL BPE token counting (graft.functions.Bpe): tiktoken-style
    // merge walk over the committed merges table, replayed exactly by the
    // DuckDB oracle's recursive CTE.
    "text_bpe_tokens" -> ((s, d) => {
      graft.plans.GraftFunctions.register(s)
      t(s, d, "documents")
        .select(col("doc_id"),
          bpeTokenCount(col("text")).as("bpe_tokens"))
        .orderBy("doc_id")
    })
  )

  def oracleSql: Map[String, String] =
    graft.queries.OpsQueries.oracleSql ++ graft.queries.ExtQueries.oracleSql ++ Map(
    // Full replay of the FAULT-INJECTING pipeline: the w4 recursive-CTE
    // walk rebuilds the sequential batch packing, each batch's fault mode
    // is the portable md5 hash mod 10 (MockTranslator's routing), and the
    // per-entry outcome reduces to arithmetic over the batch's JSON
    // geometry: mode 2 drops the batch's first entry; mode 0 truncates the
    // response at greatest(12, floor(0.6*len)) chars, and the brace-repair
    // path (F9) recovers exactly the entries whose complete `"id":"tr"`
    // pair lies inside the cut — pair_end is that pair's closing-quote
    // position inside to_json's `{"k":"v","k2":"v2"}` layout. Modes 1/4
    // (fence, line fallback) and 3 (ghost extra) recover every entry.
    "pipeline_e2e" ->
      s"""WITH RECURSIVE base AS (
         |  SELECT doc_id,
         |    CAST(doc_id AS VARCHAR) AS description_id,
         |    text AS english_sentence,
         |    upper(array_to_string(list_reverse(string_split(text, ' ')), ' ')) AS tr,
         |    CAST(CEIL(CEIL(LENGTH(text) / 4.0) * 2.8) + 1 AS BIGINT) AS cost,
         |    row_number() OVER (ORDER BY doc_id) AS rn
         |  FROM documents),
         |walk(rn, batch, running) AS (
         |  SELECT 1, CAST(0 AS BIGINT), ${math.ceil(Pipeline.DefaultSystemPrompt.length / 4.0).toLong} + cost FROM base WHERE rn = 1
         |  UNION ALL
         |  SELECT b.rn,
         |    CASE WHEN w.running + b.cost > 3000 THEN w.batch + 1 ELSE w.batch END,
         |    CASE WHEN w.running + b.cost > 3000 THEN ${math.ceil(Pipeline.DefaultSystemPrompt.length / 4.0).toLong} + b.cost
         |         ELSE w.running + b.cost END
         |  FROM walk w JOIN base b ON b.rn = w.rn + 1),
         |asg AS (
         |  SELECT b.rn, b.description_id, b.english_sentence, b.tr, w.batch,
         |    printf('batch-%04d', w.batch + 1) AS custom_id,
         |    row_number() OVER (PARTITION BY w.batch ORDER BY b.rn) AS r,
         |    1 + SUM(LENGTH(b.description_id) + LENGTH(b.tr) + 6)
         |          OVER (PARTITION BY w.batch ORDER BY b.rn ROWS UNBOUNDED PRECEDING)
         |      + row_number() OVER (PARTITION BY w.batch ORDER BY b.rn) - 1 AS pair_end
         |  FROM base b JOIN walk w ON b.rn = w.rn),
         |bat AS (
         |  SELECT batch,
         |    ('0x' || substring(md5(custom_id), 1, 15))::BIGINT % 10 AS mode,
         |    2 + SUM(LENGTH(description_id) + LENGTH(tr) + 6) + COUNT(*) - 1 AS json_len
         |  FROM asg GROUP BY batch, custom_id)
         |SELECT CAST(a.rn - 1 AS BIGINT) AS pos, a.description_id, a.english_sentence,
         |  CASE WHEN (t.mode = 0 AND a.pair_end >
         |               GREATEST(12, CAST(floor(t.json_len * 0.6) AS BIGINT)))
         |         OR (t.mode = 2 AND a.r = 1)
         |       THEN '[TRANSLATION_FAILED]' ELSE a.tr END AS translated_sentence
         |FROM asg a JOIN bat t USING (batch)
         |ORDER BY pos""".stripMargin,

    "e2e_clean" ->
      """SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS pos,
        |  CAST(doc_id AS VARCHAR) AS description_id,
        |  text AS english_sentence,
        |  upper(array_to_string(list_reverse(string_split(text, ' ')), ' '))
        |    AS translated_sentence
        |FROM documents ORDER BY pos""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 2) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "s1_scan_clean" ->
      """SELECT doc_id, TRIM(text) AS text_clean, lang FROM documents
        |WHERE text IS NOT NULL AND TRIM(text) <> '' ORDER BY doc_id""".stripMargin,

    "p3_suspicious" -> {
      val deny = suspiciousDenylist.map(x => s"'$x'").mkString(", ")
      def sus(c: String) =
        s"""($c IS NULL OR LOWER(TRIM($c)) IN ($deny)
           | OR REGEXP_MATCHES(TRIM($c), '^(```|<|\\{|\\[)')
           | OR LENGTH(TRIM($c)) < 3
           | OR REGEXP_MATCHES(TRIM($c), '^[0-9]+$$'))""".stripMargin.replace("\n", " ")
      s"""SELECT p_partkey,
         |  CAST(${sus("p_brand")} AS INT) AS brand_suspicious,
         |  CAST(${sus("SUBSTRING(p_name, 1, 2)")} AS INT) AS short_suspicious
         |FROM part ORDER BY p_partkey""".stripMargin
    },

    "p4_status_filter" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin,

    "a1_count_by_status" ->
      "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",

    "a2_count_by_lang" ->
      "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang ORDER BY lang",

    "j1_reconcile" ->
      """SELECT o.o_orderkey,
        |  COALESCE(c.c_name, '[TRANSLATION_FAILED]') AS resolved_name
        |FROM orders o LEFT OUTER JOIN
        |  (SELECT * FROM customer WHERE c_custkey % 3 <> 0) c
        |  ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin,

    "j4_missing_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "w1_shift_lead" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, next_qty FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    LEAD(l_quantity, 1) OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS next_qty
        |  FROM lineitem) x
        |WHERE l_quantity < 3 AND next_qty >= 25
        |ORDER BY l_orderkey, l_linenumber, l_quantity, next_qty""".stripMargin,

    "o1_top5_recent" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY epoch_ns(ts) DESC, event_id DESC LIMIT 5""".stripMargin,

    "f6_json_extract" ->
      """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k FROM events
        |WHERE CAST(props->>'k' AS BIGINT) > 50 ORDER BY event_id""".stripMargin,

    "dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS dup_count
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,

    // ws_tokens counts \s+-separated runs (not just ' ' chars) and
    // re_tokens uses the exact \s class — semantically equal to the Spark
    // side for any whitespace mix (ADVICE r1 finding #2).
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS BIGINT) AS ws_tokens,
        |  CAST(LENGTH(REGEXP_REPLACE(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 'x', 'g'))
        |    - LENGTH(REGEXP_REPLACE(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', '', 'g')) AS BIGINT) AS re_tokens,
        |  CAST(CASE WHEN LENGTH(text) = 0 THEN 0 ELSE CEIL(LENGTH(text) / 4.0) END AS BIGINT) AS approx_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Replays graft.functions.Bpe exactly: one recursive-CTE step = one
    // tiktoken merge (minimum-rank adjacent pair, leftmost on ties).
    "text_bpe_tokens" ->
      s"""WITH RECURSIVE
         |${graft.functions.Bpe.oracleCte("documents", "doc_id", "text")},
         |agg AS (SELECT d.doc_id, SUM(t.n) AS n
         |  FROM bpe_doc_tok d JOIN bpe_wtok t USING (w) GROUP BY d.doc_id)
         |SELECT doc_id, CAST(CASE WHEN text IS NULL THEN NULL
         |                         ELSE COALESCE(a.n, 0) END AS BIGINT) AS bpe_tokens
         |FROM documents LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin
  )
}
