package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: dumps `explain("formatted")` for the headline
  * queries so the partitioning/pushdown/broadcast/codegen choices can be
  * reviewed (and regression-checked) without a debugger. Output goes to
  * the path in args(1) (default PLANS.md).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outPath = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val headline = Seq(
      "q1_pricing_summary", "j1_reconcile", "dedup_exact", "w1_shift_lead",
      "f6_json_extract", "near_dup_pairs", "embed_cosine", "embed_topk",
      "s10_tracking_upsert", "a4_error_rollup", "w4_batcher",
      "text_bpe_tokens", "ivf_search_nprobe2",
      "simhash_near_dup", "embed_near_dup", "ann_knn_join",
      "stream_near_dup_replay", "stream_minhash_probe_replay",
      "stream_dedup_index_replay", "token_percentiles",
      "w4_batcher_par", "status_stream_replay",
      "decontaminate_flag", "quality_filter", "pii_scrub",
      "repetition_signals", "stream_embed_probe_replay",
      "asof_join", "range_join", "range_overlap",
      "ingest_pipeline", "chunk_windows",
      "vector_store_search", "vector_store_search_q8",
      "vector_store_search_many", "corpus_stats_replay",
      "manifest_corpus_replay",
      "vector_store_search_pq", "pq_codebooks",
      "manifest_skipping", "manifest_bloom_skipping",
      "train_ingest_stats_replay", "manifest_time_travel",
      "manifest_delete", "manifest_update", "manifest_merge",
      "manifest_changefeed", "manifest_schema_evolution",
      "manifest_scan_pruned", "manifest_stream_replay", "manifest_cdf",
      "manifest_cdf_stream_replay",
      "manifest_delete_dv", "manifest_update_dv", "manifest_dv_compact",
      "manifest_count_meta", "manifest_meta_minmax",
      "manifest_feed_insert_merge", "manifest_partition_pruned",
      "manifest_cdf_dv", "manifest_cdf_dv_stream_replay",
      "manifest_delete_meta", "manifest_overwrite",
      "manifest_sink_replay", "manifest_restore",
      "manifest_compact_small",
      "manifest_sql_ddl", "manifest_scan_dv",
      "manifest_restore_cdf", "manifest_restore_cdf_stream_replay",
      "manifest_partition_evolution", "vector_store_retrain",
      "manifest_sql_update", "manifest_sql_merge",
      "manifest_sql_merge_partial", "manifest_sql_merge_cond",
      "manifest_sql_merge_on_expr", "manifest_sql_merge_evolve",
      "manifest_sql_delete_in_subquery",
      "manifest_sql_rename_column", "manifest_sql_widen_type",
      "manifest_sql_replace",
      "manifest_sql_maintenance",
      "manifest_sql_meta", "manifest_table_stream_replay",
      "manifest_sql_tag", "manifest_sql_merge_delete",
      "manifest_sql_delete_exists", "manifest_sql_delete_in_multi",
      "manifest_sql_add_default", "manifest_struct_update",
      "manifest_sql_generated", "manifest_sql_identity",
      "manifest_sql_update_corr_set", "manifest_sql_merge_subquery",
      "manifest_sql_merge_theta", "manifest_sql_delete_not_in",
      "manifest_sql_generated_pruning", "manifest_sql_clone",
      "manifest_sql_where_scalar")
    val sb = new StringBuilder
    sb.append("# Physical plans (headline queries, `explain formatted`)\n\n")
    sb.append(s"Captured from `graft.Explain` on `$sfDir`. Things to check\n")
    sb.append("per plan: filters/projections reach the parquet scan\n")
    sb.append("(PushedFilters / ReadSchema), small sides broadcast, no\n")
    sb.append("redundant exchanges, WholeStageCodegen spans cover the\n")
    sb.append("expression-heavy stages.\n")
    // Post-plan audit notes: for the manifest-skipping queries the
    // interesting fact is DRIVER-side (files pruned before the scan
    // exists), invisible in the physical plan — record kept/total from
    // pruneInfo against the fixture the query builder just rebuilt.
    val notes: Map[String, SparkSession => String] = Map(
      "manifest_skipping" -> (s => {
        val (k, t) = graft.ext.ManifestTable.pruneInfo(s,
          "/tmp/graft_fix/manifest_skip",
          "doc_id >= 100 AND doc_id < 220 AND lang <> 'de'")
        s"pruneInfo (stats, clustered on doc_id): kept $k of $t files"
      }),
      "manifest_bloom_skipping" -> (s => {
        val (k, t) = graft.ext.ManifestTable.pruneInfo(s,
          "/tmp/graft_fix/manifest_bloom", "doc_id IN (42, 217, 401)")
        s"pruneInfo (blooms over full-span files): kept $k of $t files"
      }),
      // the row-level ops' interesting facts are driver-side too: the
      // candidate pruning happens before any scan exists (the builders
      // REQUIRE it — candidates < total for the delete, untouched files
      // surviving for the merge — so the audit gate is in the query
      // itself); record the post-op snapshot's provenance + file counts
      "manifest_delete" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_delete")
        val (k, t) = graft.ext.ManifestTable.pruneInfo(s,
          "/tmp/graft_fix/manifest_delete", "doc_id >= 100 AND doc_id < 220")
        s"post-delete snapshot: v${snap.version}, op=${snap.op}, " +
          s"${snap.files.size} files; pruneInfo(deleted band): kept $k of $t " +
          "(builder REQUIREd candidates < total before the rewrite)"
      }),
      "manifest_merge" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_merge")
        s"post-merge snapshot: v${snap.version}, op=${snap.op}, " +
          s"${snap.files.size} files (builder REQUIREd untouched files " +
          "to survive — candidates pruned through the source key set)"
      }),
      "manifest_changefeed" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_feed")
        s"head: v${snap.version}, op=${snap.op}; feed (1,4] reads only " +
          "the files the v2/v4 APPEND manifests added — the v3 " +
          "compaction's rewrites (which hold every b0/b1 row) contribute " +
          "nothing, by op provenance, not by file-list diffing"
      }),
      "manifest_cdf_stream_replay" -> (s => {
        "collected-sink re-sort (see manifest_stream_replay note); the " +
          "engine work is in the streaming query's micro-batches: " +
          "appends as StaticFileIndex parquet scans of their own data " +
          "files tagged insert, row-level commits as scans of their CDC " +
          "sidecars — the same DuckDB oracle as batch manifest_cdf " +
          "certifies the two consumption paths agree row-for-row"
      }),
      "manifest_cdf" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_cdf")
        s"head: v${snap.version}, op=${snap.op}, cdc sidecar=" +
          s"${snap.cdcPath.isDefined}; the plan above unions v1's data " +
          "files (inserts read in place — the files ARE the changes) " +
          "with the three row-level commits' CDC sidecars; each sidecar " +
          "was one extra filtered pass over CANDIDATE files at op time, " +
          "never a table scan"
      }),
      "manifest_stream_replay" -> (s => {
        "the audited plan above is just the collected sink re-sorted — " +
          "the engine work runs INSIDE the streaming query: each " +
          "micro-batch is a FileSourceScanExec over exactly the files " +
          "the append commits in (start, end] added (offsets = manifest " +
          "versions), with in-batch stats/bloom pruning pinned by " +
          "ManifestStreamSpec's filtered-stream test"
      }),
      "manifest_scan_pruned" -> (s => {
        val df = graft.ext.ManifestTable.scan(s, "/tmp/graft_fix/manifest_scan")
          .where("doc_id >= 100 AND doc_id < 220 AND lang <> 'de'")
        df.collect()
        val read = df.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.metrics("numFiles").value
        }.sum
        val total = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_scan").files.size
        s"executed scan numFiles: $read of $total live files — the .where " +
          "pruned through the planner (ManifestFileIndex), no readWhere " +
          "side-channel"
      }),
      "manifest_schema_evolution" -> (s => {
        val sc = graft.ext.ManifestTable.tableSchema(
          graft.ext.ManifestTable.snapshot(s, "/tmp/graft_fix/manifest_evolve"))
        s"schema-on-manifest: ${sc.map(_.simpleString).getOrElse("(none)")} — " +
          "the scan's ReadSchema above carries all three columns even " +
          "though b0's files predate `lang`"
      }),
      // merge-on-read: the interesting facts are in the post-op
      // snapshot (file set preserved, vectors recorded) — the plan
      // above shows the READ side's broadcast anti-join per DV'd file
      "manifest_delete_dv" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_delete_dv")
        s"post-DV-delete snapshot: v${snap.version}, op=${snap.op}, " +
          s"${snap.files.size} files (builder REQUIREd the file set " +
          s"UNCHANGED), ${snap.dvs.size} files carry deletion vectors " +
          s"(${snap.dvs.valuesIterator.flatten.map(_.rows).sum} positions " +
          "total — O(matched rows) written, not O(file))"
      }),
      "manifest_update_dv" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_update_dv")
        s"post-DV-update snapshot: v${snap.version}, op=${snap.op}, " +
          s"${snap.files.size} files, ${snap.dvs.size} DV'd (builder " +
          "REQUIREd every pre-existing file to survive — matched rows " +
          "landed as vector + appended rewrites only)"
      }),
      "manifest_dv_compact" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_dv_compact")
        s"post-purge snapshot: v${snap.version}, op=${snap.op}, " +
          s"${snap.files.size} files, ${snap.dvs.size} DV'd (builder " +
          "REQUIREd the purge rewrote ONLY the threshold-crossing files " +
          "and cleared their vector references; readers see no change)"
      }),
      "manifest_count_meta" -> (s => {
        val n = graft.ext.ManifestTable.metaCount(s,
          "/tmp/graft_fix/manifest_count_meta")
        s"metaCount = ${n.getOrElse(-1L)} from footer row counts minus " +
          "DV positions — zero data files opened (FS-seam-pinned by " +
          "ManifestDvSpec); the trivial plan above is just the answer row"
      }),
      "manifest_meta_minmax" -> (s => {
        "min/max answered from manifest ColStats across both appends' " +
          "files — zero data I/O; honesty edges (DV'd file, unknown " +
          "column → None + real-scan fallback) REQUIREd in the builder"
      }),
      "manifest_feed_insert_merge" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_feed_im")
        s"head: v${snap.version}; the append feed classified commits by " +
          "DELTA CONTENT, not op label: the pure-insert merge's adds " +
          "surfaced, the compaction and the zero-match DV delete " +
          "contributed nothing, and a row-removing commit would raise"
      }),
      "manifest_partition_pruned" -> (s => {
        val (k, t) = graft.ext.ManifestTable.pruneInfo(s,
          "/tmp/graft_fix/manifest_partition", "lang = 'de'")
        val nParts = graft.ext.ManifestTable.partitions(s,
          "/tmp/graft_fix/manifest_partition").count()
        s"pruneInfo (partition tuple, exact point stats): kept $k of $t " +
          s"files across $nParts partitions; builder REQUIREd the " +
          "planner scan's numFiles to equal the partition's file count"
      }),
      "manifest_compact_small" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_compact_small")
        s"post-pack snapshot: v${snap.version}, op=${snap.op}, " +
          s"${snap.files.size} files — only the under-sized trickle " +
          "repacked (builder REQUIREd the big file byte-identical and " +
          "the feeds silent); O(small bytes) maintenance, never O(table)"
      }),
      "manifest_restore" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_restore")
        s"head: v${snap.version}, op=${snap.op} — the band delete undone " +
          "by one metadata commit (builder REQUIREd v1's byte-identical " +
          "file set back, zero rewrites); the delta carries cleardv+adds " +
          "so a cold driver replays the rewind exactly"
      }),
      "manifest_sink_replay" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_sink_dst")
        s"piped table: v${snap.version}, batches ${snap.batchIds.toSeq.sorted
          .mkString(", ")} — one manifest commit per micro-batch " +
          "(stream-<n> ids = the exactly-once dedup key), partitioned by " +
          s"(${snap.partitionCols.mkString(", ")}) from the writer's " +
          "partitionBy; the engine work is two real streaming queries, " +
          "no driver data path"
      }),
      "manifest_sql_ddl" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlddl")
        s"SQL-built table: v${snap.version}, op=${snap.op}, " +
          s"partitioned by (${snap.partitionCols.mkString(", ")}) — the " +
          "whole CREATE/INSERT/DELETE/re-INSERT cycle ran through " +
          "spark.sql against the DSv2 catalog; the SELECT's " +
          "FileSourceScanExec below IS the ManifestFileIndex plan " +
          "(builder REQUIREd the partition probe read exactly the " +
          "partition's files)"
      }),
      "manifest_sql_update" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlupd")
        s"SQL UPDATE target: v${snap.version}, op=${snap.op} — the " +
          "UPDATE statement lowered (GraftDmlRule) to updateWhere's " +
          "file-pruned copy-on-write commit; the builder REQUIREd the " +
          "partition predicate proved the non-matching partitions " +
          "untouchable before the rewrite"
      }),
      "manifest_sql_merge" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlmrg")
        s"SQL MERGE target: v${snap.version}, op=${snap.op} — the " +
          "upsert-shaped MERGE INTO lowered (GraftDmlRule) to merge's " +
          "source-key-pruned commit; the builder REQUIREd a strict " +
          "subset of files rewrote (O(matched files), never O(table))"
      }),
      "manifest_sql_merge_on_expr" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlmox")
        s"rich-ON MERGE target: v${snap.version}, op=${snap.op} — " +
          "ON t.doc_id = s.src_id AND s.sn > t.n_chars lowered " +
          "(GraftDmlRule) to mergeGeneral with the differently-named " +
          "key as the pruning pair and the non-equi conjunct as match " +
          "residue; the builder REQUIREd a strict subset of files " +
          "rewrote (key equalities alone drive pruning, the residue " +
          "only narrows the match)"
      }),
      "manifest_sql_merge_evolve" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlmev")
        s"schema-evolved MERGE target: v${snap.version}, op=${snap.op} — " +
          "MERGE WITH SCHEMA EVOLUTION rode the analyzer's " +
          "ResolveMergeIntoSchemaEvolution (AUTOMATIC_SCHEMA_EVOLUTION " +
          "capability): the source-new column committed as a nullable " +
          "metadata ADD, old files null-fill on read, and the merge " +
          "lowered against the evolved schema; the builder REQUIREd " +
          "the evolved projection and a strict-subset rewrite"
      }),
      "manifest_sql_delete_in_subquery" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqldsq")
        s"IN-subquery DELETE target: v${snap.version}, op=${snap.op} — " +
          "the uncorrelated subquery literalized at command time to a " +
          "bounded IN-list (GraftDeleteSubqueryCommand), which drove " +
          "the same stats/bloom candidate pruning a literal IN gets; " +
          "the builder REQUIREd a strict-subset rewrite; correlated " +
          "subqueries lower to the key-joined path instead (next note)"
      }),
      "manifest_sql_delete_exists" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqldex")
        s"correlated-DML target: v${snap.version}, op=${snap.op} — " +
          "DELETE WHERE EXISTS decorrelated at resolution " +
          "(GraftDmlRule.correlatedLowering) to deleteMatching: the " +
          "equality correlation became the source-key pruning pair, no " +
          "driver collect, no key-count ceiling; the builder REQUIREd " +
          "a strict-subset rewrite for the semi shape and the NMBS " +
          "'merge' provenance for NOT EXISTS (inherently full-scope)"
      }),
      "manifest_sql_delete_in_multi" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqldim")
        s"tuple-IN DELETE target: v${snap.version}, op=${snap.op} — " +
          "(doc_id, lang) IN (subquery) routed through the same " +
          "key-joined lowering (two pruning key columns, range " +
          "conjuncts); the single-column literalizer is not its ceiling"
      }),
      "manifest_sql_add_default" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqladf")
        s"ADD COLUMN DEFAULT target: v${snap.version}, op=${snap.op} — " +
          "the ADD was REQUIREd metadata-only (zero file moves): " +
          "EXISTS_DEFAULT read-fills pre-ADD files inside Spark's own " +
          "parquet readers (per-file-footer absence, both scan paths), " +
          "CURRENT_DEFAULT serves INSERT omission; SET DEFAULT moved " +
          "only the latter — history stayed frozen"
      }),
      "manifest_struct_update" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlstu")
        s"struct-column table: v${snap.version}, op=${snap.op} — " +
          "the builder REQUIREd (a) a numFiles-pruned planner probe on " +
          "meta.n (Skipping maps resolved GetStructField to the " +
          "footer's dotted leaf stats key), (b) a strict-subset rewrite " +
          "for SET meta.n = ... (doc_id candidates), and (c) a " +
          "strict-subset rewrite for a meta.n WHERE on the SQL-string " +
          "seam (resolveStructPaths binds the leaf there too)"
      }),
      "manifest_sql_generated" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlgen")
        s"generated-column table: v${snap.version}, op=${snap.op} — " +
          "nc2 = n_chars * 2 + doc_id % 7 rides the schema metadata; " +
          "inserts computed it, the banded UPDATE recomputed it (with " +
          "the REQUIREd strict-subset candidate rewrite), the general " +
          "MERGE recomputed matched rows and computed partial inserts; " +
          "explicit wrong values die on the synthetic <=> check in the " +
          "one-aggregate constraint pass"
      }),
      "manifest_sql_identity" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlidn")
        s"identity table: v${snap.version}, op=${snap.op}, mark=" +
          s"${snap.properties.getOrElse("graft.identity.hwm.id", "?")} — " +
          "appends minted dense base+step*pos values (RDD zipWithIndex, " +
          "no sort, no single-partition window); the mark is a " +
          "versioned table property advanced from the staged files' own " +
          "footer stats, and a racing append aborts on a moved mark " +
          "(conflict-rebase) so ranges can never overlap; the DELETE " +
          "was REQUIREd not to move the mark"
      }),
      "manifest_sql_update_corr_set" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlucs")
        s"correlated-SET target: v${snap.version}, op=${snap.op} — " +
          "UPDATE SET v = (SELECT ... WHERE s.k = t.k) decorrelated at " +
          "resolution (scalarSubqueryLowering) to a mergeGeneral with a " +
          "MATCHED update from the joined value and an NMBS update " +
          "null-filling the subquery slot; the statement WHERE doubled " +
          "as the candidate SCOPE (REQUIREd strict-subset rewrite " +
          "despite the NMBS quantifier), and the aggregate shape " +
          "grouped the decorrelated frame on the correlation key"
      }),
      "manifest_sql_merge_subquery" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlmsq")
        s"subquery-MERGE target: v${snap.version}, op=${snap.op} — " +
          "uncorrelated scalars in the clause condition, SET value and " +
          "INSERT VALUES rode the command as held pre-renamed " +
          "expressions and literalized once at run time (subqueries " +
          "execute when the DML executes); correlated ones stay a loud " +
          "rejection naming the USING-source rewrite"
      }),
      "manifest_sql_merge_theta" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlmth")
        s"theta-MERGE target: v${snap.version}, op=${snap.op} — an ON " +
          "with no equality pair lowered with keyCols empty: the whole " +
          "ON is the residue, candidates are the full file list (no key " +
          "stat bounds a non-equi match — the documented Delta-parity " +
          "cost), the insert side anti-joined on the full ON, and the " +
          "cardinality probe still raises on overlapping ranges"
      }),
      "manifest_sql_delete_not_in" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqldni")
        s"NOT-IN DELETE target: v${snap.version}, op=${snap.op} — " +
          "correlated NOT IN lowered to the NMBS anti-join under the " +
          "static no-NULL proof (doc_id declared NOT NULL; the " +
          "subquery pins its output with IS NOT NULL); unprovable " +
          "shapes stay loud with the IS NOT NULL / NOT EXISTS rewrites " +
          "named — three-valued semantics are never approximated"
      }),
      "manifest_sql_generated_pruning" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlgpp")
        val (k, t) = graft.ext.ManifestTable.pruneInfo(s,
          "/tmp/graft_fix/wh/sqlgpp",
          "ts >= TIMESTAMP'2024-03-05 00:00:00' AND " +
            "ts < TIMESTAMP'2024-03-07 00:00:00'")
        s"generated-partition table: v${snap.version}, op=${snap.op}, " +
          s"${snap.files.size} day files; pruneInfo(ts band alone): " +
          s"kept $k of $t — withGeneratedDerived added the day bound " +
          "from the CAST-to-date generation (monotone), so scans AND " +
          "row-op candidates prune date partitions from raw-ts " +
          "predicates (builder REQUIREd numFiles <= 3 on both paths)"
      }),
      "manifest_sql_clone" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlcln2")
        val abs = snap.files.count(_.startsWith("/"))
        s"shallow clone: v${snap.version}, op=${snap.op}, " +
          s"$abs of ${snap.files.size} entries still shared (absolute " +
          "paths into the source's data dir) — the clone commit copied " +
          "ZERO data files (REQUIREd), the divergent UPDATE un-shared " +
          "exactly its pruned candidates, and the clone's vacuum can " +
          "only sweep its own data dir, never the referenced source"
      }),
      "manifest_sql_where_scalar" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlwsc")
        s"scalar-WHERE target: v${snap.version}, op=${snap.op} — " +
          "DELETE/UPDATE WHERE n < (SELECT ... WHERE s.k = t.k) " +
          "decorrelated like SET values: the scalar guards the single " +
          "MATCHED clause (no-match rows never match — SQL's NULL " +
          "filtering, proven by the slot null-rejection allowlist), " +
          "candidates stay SOURCE-KEY-PRUNED (no NMBS; REQUIREd " +
          "strict subset), and a dup-valued correlation key raises " +
          "'more than one row' BEFORE the merge — a value-dependent " +
          "condition must never silently pick a value"
      }),
      "manifest_sql_maintenance" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlmnt")
        s"CALL-maintained table: v${snap.version}, op=${snap.op}, " +
          s"${snap.files.size} live files — clustered compact, CoW " +
          "DELETE, bin-pack, checkpoint, expire_log and zero-grace " +
          "vacuum all ran as graft_fix.system.* stored procedures; the " +
          "builder REQUIREd each pass's observable effect (pack " +
          "shrank the count, expiry dropped entries, vacuum collected)"
      }),
      "manifest_sql_meta" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlmeta")
        s"metadata faces over v${snap.version} (${snap.files.size} live " +
          "files): history/files/partitions/detail answered from " +
          "manifest math — the builder REQUIREd the files face to list " +
          "exactly the snapshot's live files, and DuckDB certified the " +
          "partitions face's per-partition row counts; zero data-file " +
          "opens at any table size"
      }),
      "manifest_table_stream_replay" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlstrm")
        s"streamed catalog table: v${snap.version}, " +
          s"changeFeed=${graft.ext.ManifestTable.changeFeedEnabled(snap)} " +
          "— readStream.table rewrote to the graft-manifest V1 source " +
          "(version-offset micro-batches), the TBLPROPERTIES change-feed " +
          "toggle made the SQL UPDATE record its CDC sidecar, and the " +
          "collected feed hash-matched DuckDB's replay"
      }),
      "manifest_sql_tag" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqltag")
        val tags = graft.ext.ManifestTable.tags(snap)
        s"tagged table: head v${snap.version}, tags=" +
          tags.toSeq.sorted.map { case (t, v) => s"$t->v$v" }
            .mkString("{", ", ", "}") +
          " — VERSION AS OF 'baseline' resolved through the tag after " +
          "zero-retention expire_log (floor held at the tag) and " +
          "zero-grace vacuum (tagged files stayed live) plus a later " +
          "overwrite; DuckDB certified the pinned snapshot byte-exact"
      }),
      "manifest_sql_merge_delete" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/wh/sqlmdel")
        s"tombstone-applied table: v${snap.version}, op=${snap.op} — " +
          "MERGE ... WHEN MATCHED THEN DELETE lowered (GraftDmlRule) to " +
          "deleteMatching's source-key-pruned copy-on-write commit; the " +
          "builder REQUIREd a strict subset of files rewrote (a CDC " +
          "tombstone batch is O(matched files), never O(table))"
      }),
      "vector_store_retrain" -> (s => {
        val st = graft.ext.VectorStore.driftStats(s,
          "/tmp/graft_fix/vector_store_retrain")
        f"post-retrain store: ${st.rows} rows in ${st.cells} cells, " +
          f"mean q-error ${st.meanSqDist}%.3f, max cell ${st.maxCellFraction}%.2f " +
          "— the builder REQUIREd the drifted corpus spiked the error, " +
          "retrain lowered it (k-means objective) and recall@10 did not " +
          "regress; the swap is one atomic overwrite commit + centroid " +
          "rename, searches stay cell-pruned"
      }),
      "manifest_partition_evolution" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_part_evolve")
        s"head: v${snap.version}, partitioned by " +
          s"(${snap.partitionCols.mkString(", ")}) — the second append " +
          "added a nullable column; the partition read below spans both " +
          "generations (old files null-fill) and the builder REQUIREd " +
          "numFiles == the partition's files across the evolution"
      }),
      "manifest_restore_cdf" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_restore_cdf")
        s"head: v${snap.version}, op=${snap.op}, dvs=${snap.dvs.size} — " +
          "the feed SPANS the rewind: v4's part below is the synthesized " +
          "snapshot diff (resurrected files read + un-deleted DV " +
          "positions semi-joined), O(changed files), never O(table)"
      }),
      "manifest_restore_cdf_stream_replay" -> (s => {
        "same history through the streaming engine: the restore diff " +
          "rides one micro-batch as a re-marked batch plan " +
          "(GraftSqlShims.asStream), delivered exactly once"
      }),
      "manifest_scan_dv" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_scan_dv")
        val dvd = snap.files.count(f => snap.dvs.get(f).exists(_.nonEmpty))
        s"head: v${snap.version}, $dvd of ${snap.files.size} files carry " +
          "outstanding deletion vectors — the union plan below scans " +
          "clean files through the pruned FileIndex branch " +
          "(FileSourceScanExec) and anti-joins only the DV'd files; " +
          "one point delete no longer costs the table its planner pruning"
      }),
      "manifest_overwrite" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_overwrite")
        s"post-overwrite snapshot: v${snap.version}, op=${snap.op}, " +
          s"${snap.files.size} files — the de partition's old files " +
          "dropped by metadata, the fresh frame staged under the same " +
          "layout (builder REQUIREd exact drop set + new files' tuples); " +
          "replaceWhere = one atomic commit, O(region) work"
      }),
      "manifest_delete_meta" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_delete_meta")
        s"post-delete snapshot: v${snap.version}, op=${snap.op}, " +
          s"${snap.files.size} files — the partition's files dropped by " +
          "pure metadata (builder REQUIREd zero adds and exact drop set; " +
          "Skipping.provesAll proved every candidate row matches, so " +
          "nothing was read or rewritten)"
      }),
      "manifest_cdf_dv" -> (s => {
        val snap = graft.ext.ManifestTable.snapshot(s,
          "/tmp/graft_fix/manifest_cdf_dv")
        s"head: v${snap.version}, ${snap.dvs.size} DV'd files; the feed " +
          "unions v1's data files (inserts in place) with the DV ops' " +
          "CDC sidecars, and walks ACROSS v4's zero-match cdc=true " +
          "delete (an empty commit, no sidecar) without raising — " +
          "classification is by delta content"
      }),
      "manifest_cdf_dv_stream_replay" -> (s => {
        "collected-sink re-sort (see manifest_stream_replay note); the " +
          "engine work is the streaming CDF's micro-batches over a " +
          "MERGE-ON-READ history — DV sidecars as change rows, the " +
          "zero-match empty commit skipped — hash-matched to the same " +
          "DuckDB oracle as batch manifest_cdf_dv"
      }),
      // the ADC coarse pass executes eagerly inside searchPq (its
      // candidate ids feed the rerank plan above), so audit its scan
      // here: ReadSchema must carry pq_code + norm and NEITHER vector
      // column — the bytes-read claim of product quantization
      "vector_store_search_pq" -> (s => {
        val qv = graft.ext.ManifestTable.read(s, "/tmp/graft_fix/vector_store_pq")
          .filter(org.apache.spark.sql.functions.col("vec_id") === 0)
          .selectExpr("transform(embedding, x -> cast(x as double)) as v")
          .collect()(0).getSeq[Double](0)
        "ADC coarse pass plan:\n" + graft.ext.VectorStore.pqCoarse(
          s, "/tmp/graft_fix/vector_store_pq", qv, nprobe = 2, limit = 40,
          excludeId = Some(0L)).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      }))
    headline.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        sb.append(s"\n## $name\n\n```\n")
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          sb.append(plan)
          notes.get(name).foreach(n => sb.append(s"\n${n(spark)}\n"))
        } catch {
          case e: Throwable => sb.append(s"explain failed: ${e.getMessage}")
        }
        sb.append("```\n")
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), sb.toString)
    println(s"wrote $outPath")
    spark.stop()
  }
}
