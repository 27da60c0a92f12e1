package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-star brief):
  * language identification, document fingerprinting, and text SimHash.
  * Quality ratios live in graft.functions.TextFunctions. Everything is a
  * deterministic Column expression (whole-stage codegen, SQL-replayable).
  */
object TextAnalysis {

  /** Tiny per-language function-word lists for the heuristic language ID.
    * Word-list hits are a standard cheap LID signal (cf. McNamee,
    * "Language identification: a solved problem suitable for teaching").
    */
  val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour"),
    "es" -> Seq("el", "los", "y", "es", "una", "que", "por", "con"))

  private def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Function-word hit count for one language list. */
  def langScore(text: Column, lang: String): Column = {
    val list = langWords.toMap.apply(lang)
    size(filter(words(text), w => w.isin(list: _*)))
  }

  /** Heuristic language ID: argmax of function-word hits with a fixed
    * tiebreak order (en > de > fr > es); no hits → "unknown".
    *
    * Runs as the native [[graft.plans.LangId]] expression: the composed
    * form ([[langIdSpec]], the SQL-replayable specification) re-splits
    * the text once per LANGUAGE and filters each token array
    * interpreted; the expression tokenizes once and counts all four
    * lists via hash lookups in one JVM pass.
    */
  def langId(text: Column): Column = {
    graft.plans.GraftFunctions.ensureRegistered(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_lang_id", text)
  }

  /** The composed-Column specification of [[langId]]. */
  def langIdSpec(text: Column): Column = {
    val scores = langWords.map { case (l, _) => l -> langScore(text, l) }
    val all = scores.map(_._2)
    scores.foldRight(lit("unknown")) { case ((l, s), rest) =>
      when(s > 0 && all.map(o => s >= o).reduce(_ && _), lit(l)).otherwise(rest)
    }
  }

  private val langUnknown =
    org.apache.spark.unsafe.types.UTF8String.fromString("unknown")

  /** "unknown" as a shared UTF8String — the null-input result of
    * [[graft.plans.LangId]] (callable from generated code).
    */
  def langIdUnknown(): org.apache.spark.unsafe.types.UTF8String = langUnknown

  private lazy val langSets: Array[(String, java.util.HashSet[String])] =
    langWords.map { case (l, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      (l, s)
    }.toArray
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  /** The exact per-row computation of [[graft.plans.LangId]]: tokenize
    * lower(trim(text)) by whitespace once, count hits per language, take
    * the first language in declaration order whose positive score ties
    * the maximum — identical to the composed when-chain.
    */
  def langIdJvm(text: org.apache.spark.unsafe.types.UTF8String)
  : org.apache.spark.unsafe.types.UTF8String = {
    val s = text.trim().toLowerCase.toString
    val toks = wsPattern.split(s, -1)
    val scores = new Array[Int](langSets.length)
    var t = 0
    while (t < toks.length) {
      var i = 0
      while (i < langSets.length) {
        if (langSets(i)._2.contains(toks(t))) scores(i) += 1
        i += 1
      }
      t += 1
    }
    var max = 0
    var i = 0
    while (i < scores.length) { if (scores(i) > max) max = scores(i); i += 1 }
    if (max == 0) return org.apache.spark.unsafe.types.UTF8String.fromString("unknown")
    i = 0
    while (scores(i) != max) i += 1
    org.apache.spark.unsafe.types.UTF8String.fromString(langSets(i)._1)
  }

  /** Karp-Rabin-style rolling hash over the character stream:
    * h = (h * 31 + code) mod 10^15+37. The modulus keeps every
    * intermediate under 2^62 so the fold never overflows a long, and the
    * arithmetic is plain integer ops any SQL engine reproduces exactly.
    */
  val RollMod: Long = 1000000000000037L

  /** Runs as the native [[graft.plans.RollingHash]] expression: the
    * composed form ([[rollingHashSpec]], the SQL-replayable
    * specification) splits every row into a PER-CHARACTER string array
    * and folds it with two more interpreted higher-order passes; the
    * expression is one JVM loop over the code points.
    */
  def rollingHash(text: Column): Column = {
    graft.plans.GraftFunctions.ensureRegistered(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_rolling_hash", text)
  }

  /** The composed-Column specification of [[rollingHash]]. */
  def rollingHashSpec(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, code) => (acc * 31 + code) % RollMod)

  /** The exact per-row computation of [[graft.plans.RollingHash]]:
    * left-to-right (acc * 31 + codepoint) % RollMod over the text's code
    * points — identical to the composed fold (split("") keeps surrogate
    * pairs whole, ascii() is the first code point; an EMPTY string folds
    * one ascii("") = 0 element, which equals the empty fold's 0).
    */
  def rollingHashJvm(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val s = text.toString
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % RollMod
      i += Character.charCount(cp)
    }
    acc
  }

  /** 32-bit text SimHash over whitespace tokens: token hashes vote ±1 per
    * bit position; the sign of each bit-sum sets the output bit
    * (Charikar '02). Uses the portable 60-bit md5 hash so a SQL oracle
    * replays it bit-for-bit.
    *
    * Runs as the native [[graft.plans.SimHash32]] expression — the
    * composed form is 32 interpreted `aggregate` folds over the token
    * hashes PER ROW, which made the signature projection the dominant
    * cost of simhash dedup (~1.4 ms/doc); the expression is one JVM loop
    * (one md5 per token, 32 int votes). [[simhash32Spec]] stays as the
    * SQL-replayable specification pinned by a parity test.
    */
  def simhash32(text: Column): Column = {
    graft.plans.GraftFunctions.ensureRegistered(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_simhash32", text)
  }

  /** The composed-Column specification of [[simhash32]]. */
  def simhash32Spec(text: Column): Column = {
    val hashes = transform(words(text), t => MinHashLSH.hash60(0, t))
    (0 until 32).map { j =>
      val bitSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(1) * 2 - 1))
      when(bitSum > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** The exact per-row computation of [[graft.plans.SimHash32]]: trim
    * spaces, lowercase, whitespace-split (Java regex semantics, identical
    * to Spark's `split`), then one md5 per token with the top 60 bits as
    * the hash (== first 15 hex chars, exactly [[MinHashLSH.hash60]] at
    * seed 0) voting ±1 per bit position.
    */
  def simhash32Jvm(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val toks = text.trim().toLowerCase.toString.split("\\s+", -1)
    val votes = new Array[Int](32)
    val md = md5Digest.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(("0:" + toks(i)).getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars of the md5 == the top 60 bits of the digest —
      // identical to conv(substring(md5('0:'||t),1,15),16,10) in hash60
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      h = (h << 4) | ((d(7) & 0xffL) >>> 4)
      var j = 0
      while (j < 32) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Hamming distance between two simhash values (for near-dup banding). */
  // ------------------------------------------------- repetition signals

  /** Fraction of non-blank lines that are repeats of an earlier line —
    * the Gopher-style boilerplate detector (nav bars, footers, chat
    * logs). Pure array expression per row: no shuffle, no UDF. Empty or
    * line-less text scores 0.
    */
  def dupLineFraction(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    when(size(lines) <= 0, lit(0.0)).otherwise(
      round(lit(1.0) -
        size(array_distinct(lines)).cast("double") / size(lines), 4))
  }

  /** ALL word n-gram windows, NOT deduplicated — the counting sibling of
    * [[MinHashLSH.wordShingles]] (whose first-occurrence-distinct is
    * right for set similarity and exactly wrong for repetition
    * measurement). Short texts yield their single sub-n window.
    */
  def wordNgramsAll(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))
  }

  /** Per-document share of n-gram windows taken by the single most
    * frequent n-gram — near 1/windows for healthy prose, toward 1.0 for
    * TEMPLATE TEMPLATE TEMPLATE spam. Distributed shape: explode →
    * count by (doc, gram) → max per doc, two map-side-combining
    * shuffles; the per-doc mode cannot be a scan-local projection
    * without quadratic per-row work, so this is a DataFrame op, not a
    * Column. Returns (idCol, top_ngram_cov).
    */
  def topNgramCoverage(docs: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String, n: Int = 2)
  : org.apache.spark.sql.DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(wordNgramsAll(col(textCol), n)).as("gram"))
      .groupBy(idCol, "gram").agg(count(lit(1)).as("cnt"))
      .groupBy(idCol).agg(
        round(max(col("cnt")).cast("double") / sum(col("cnt")), 4)
          .as("top_ngram_cov"))

  // --------------------------------------------------- corpus statistics

  /** Corpus-wide top-k n-grams by frequency — the "what is this corpus
    * made of" report. explode → count → TakeOrdered: the groupBy
    * partial-aggregates map-side and only k rows reach the driver;
    * deterministic tie order (count desc, gram asc) keeps the report
    * oracle-checkable.
    */
  def topNgrams(docs: org.apache.spark.sql.DataFrame, textCol: String,
                n: Int = 2, k: Int = 20): org.apache.spark.sql.DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(explode(wordNgramsAll(col(textCol), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(k)

  /** Sketch-based corpus statistics — the single-pass scale path for
    * numbers whose exact forms need a full shuffle of distinct keys:
    * HyperLogLog++ distinct-document estimate (`approx_count_distinct`,
    * bounded relative error `rsd`) and Greenwald-Khanna approximate
    * token-count percentiles (`percentile_approx`, rank error ≤
    * 1/accuracy). At 100 TB the exact versions ship every distinct
    * fingerprint / sort every group through the shuffle; the sketches
    * keep a constant-size summary per partition and merge on the
    * driver. NOT oracle-checkable — HLL/GK internals differ across
    * engines — so the contract is pinned by a spec bounding each
    * estimate against the exact operator instead. One row:
    * (n_docs, approx_distinct_docs, tok_p50, tok_p90, tok_p99).
    */
  def approxCorpusStats(docs: org.apache.spark.sql.DataFrame,
                        textCol: String, rsd: Double = 0.02,
                        accuracy: Int = 1000): org.apache.spark.sql.DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(col(textCol),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tok"))
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(col(textCol), rsd).as("approx_distinct_docs"),
        percentile_approx(col("n_tok"), lit(0.5), lit(accuracy)).as("tok_p50"),
        percentile_approx(col("n_tok"), lit(0.9), lit(accuracy)).as("tok_p90"),
        percentile_approx(col("n_tok"), lit(0.99), lit(accuracy)).as("tok_p99"))

  // ------------------------------------------------------ text chunking

  /** Sliding token-window chunking — the training-window prep that turns
    * long documents into fixed-size overlapping pieces. Windows start at
    * token 1, 1+stride, 1+2·stride, … for every start ≤ token count, the
    * final window truncating at the document end (so every token is
    * covered and short docs yield one window). Whitespace tokens stand
    * in for tokenizer output; swap the splitter for real BPE offsets in
    * production. One row per (doc, window): a pure explode projection
    * over the scan — no shuffle, no UDF. Emits idCol, `chunk_idx`,
    * `chunk_text`, `n_tokens`.
    */
  def chunkWindows(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, chunkTokens: Int = 32, stride: Int = 24)
  : org.apache.spark.sql.DataFrame = {
    require(stride > 0 && chunkTokens > 0, "chunkTokens and stride must be > 0")
    val toks = split(trim(col(textCol)), "\\s+")
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), posexplode(transform(
        sequence(lit(1), greatest(size(toks), lit(1)), lit(stride)),
        s => slice(toks, s, lit(chunkTokens)))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        concat_ws(" ", col("col")).as("chunk_text"),
        size(col("col")).cast("long").as("n_tokens"))
  }

  // ------------------------------------------------------ PII scrubbing

  /** PII scrub patterns — a standard pre-training redaction pass.
    * Deliberately RE2-compatible (no lookaround, no backreferences) so
    * the identical pattern runs under Spark's java.util.regex AND the
    * DuckDB oracle's RE2; ORDER MATTERS and is fixed by [[scrubPii]]:
    * emails first (their local parts contain digits a later pass could
    * shred), then dotted quads, then phone-shaped digit groups (which
    * must not see the digits inside an unscrubbed IP).
    *
    * The phone pattern is two branches (ADVICE r8: the old "any 9+-char
    * digit/dash/space run" scrubbed ISO timestamps like
    * `2026-08-13 10:30` and serial runs): an international form —
    * `+`, 1-3 digit country code, then 2-4 separator-delimited digit
    * groups — and a domestic form — a 3-4 digit prefix (optionally
    * parenthesised 3-digit area code), a separator, then 1-2 more
    * groups of 3-4 digits. Separators are a SINGLE dash or space, so a
    * date's `4-2-2` grouping and unseparated ID runs never match.
    * Residual false-positive class, documented rather than chased:
    * separator-joined 3/4-digit pairs such as a year range `1990-2010`
    * are indistinguishable from a 7/8-digit local number by shape
    * alone — a production scrubber layers checksum/region validation on
    * top of this regex.
    */
  val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiIpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val piiPhoneRe =
    "\\+\\d{1,3}[- ]\\d{1,4}([- ]?\\d{2,6}){1,3}" +
      "|(\\(\\d{3}\\)[- ]?|\\d{3,4}[- ])\\d{3,4}([- ]\\d{3,4})?\\b"

  /** Replace emails / IPv4s / phone-shaped digit runs with typed
    * placeholders. Three chained regexp_replace projections — fully
    * codegen'd, no UDF, scan-parallel; at 100 TB this is a pure map over
    * the text column with zero shuffle.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, piiEmailRe, "<EMAIL>"),
        piiIpRe, "<IP>"),
      piiPhoneRe, "<PHONE>")

  def hammingDist32(a: Column, b: Column): Column =
    (0 until 32).map { j =>
      shiftright(a.bitwiseXOR(b), j).bitwiseAND(1)
    }.reduce(_ + _)

  /** SimHash-banded near-duplicate pairs (north-star brief: SimHash
    * dedup): the 32-bit simhash splits into `bands` equal bit-slices and
    * documents sharing any slice value become candidates. By pigeonhole,
    * hamming(a,b) <= bands-1 forces at least one identical slice, so at
    * the default (bands=4, maxHamming=3) candidate generation is EXACT —
    * no near-dup under the verify threshold can be missed. Candidates are
    * then verified with the exact [[hammingDist32]].
    *
    * Scale: the corpus collapses to its DISTINCT signatures first
    * (`groupBy(sh)` — one shuffle of (8-byte sh, id) rows), and ONLY the
    * distinct signatures enter the band self-join, with each signature's
    * id list riding along. A corpus of near-identical documents — the
    * common case that motivates dedup — therefore joins over a frame
    * orders of magnitude smaller than the corpus, and identical-signature
    * clusters (which would otherwise be quadratic hot buckets in the
    * join) become intra-group pair expansions of the id lists, which is
    * output-sized work by definition. Hamming is evaluated once per
    * signature PAIR, not per document pair. A signature pair agreeing in
    * several bands would be emitted once per band; since both full
    * signatures ride on the joined row, keeping only the FIRST agreeing
    * band dedups exactly-once as a stateless per-row filter — no
    * distinct() exchange. The one degenerate case is a single group
    * holding most of the corpus (e.g. billions of byte-identical rows):
    * its id list — and the output itself — is quadratic in that cluster;
    * cap or exact-dedup such corpora upstream
    * ([[graft.queries.OpsQueries]] `dedup_exact`) before pairing.
    */
  def simhashNearDup(docs: org.apache.spark.sql.DataFrame,
                     idCol: String, textCol: String,
                     bands: Int = 4, maxHamming: Int = 3): org.apache.spark.sql.DataFrame = {
    require(32 % bands == 0, s"bands must divide 32, got $bands")
    val width = 32 / bands
    val mask = (1L << width) - 1
    def bitSlice(sh: Column, b: Int): Column =
      shiftright(sh, b * width).bitwiseAND(mask)

    // the only corpus-sized pass: simhash every document, group by the
    // signature (null signatures — null text — never pair; drop them)
    // Null text never pairs: filter the CHEAP column (pushes into the
    // parquet scan) rather than the signature — any isnotnull(sh) filter,
    // explicit or inferred by InferFiltersFromConstraints from the
    // group/join keys, gets substituted through the projection and
    // re-evaluates simhash per row in its own stage (PLANS.md showed the
    // doubled eval before this fix). simhash is null only for null text,
    // so the coalesce sentinel never fires; it exists to make the column
    // NON-NULLABLE so no isnotnull constraint is inferred at all.
    val groups = graft.core.Caches.track(
      docs.filter(col(textCol).isNotNull)
        .select(col(idCol).cast("long").as("id"),
          coalesce(simhash32(col(textCol)), lit(0L)).as("sh"))
        .groupBy("sh").agg(sort_array(collect_list(col("id"))).as("ids"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))

    // identical signatures: hamming 0, pairs expanded from the sorted list
    val intra = groups
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
          struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"),
        lit(0L).as("hamming"))

    // distinct signatures: banded candidate join, exact-hamming verify,
    // then expand each surviving signature pair to its id cross product
    val bandRows = groups.select(col("sh"), col("ids"),
      explode(array((0 until bands).map(b => struct(
        lit(b).as("band"), bitSlice(col("sh"), b).as("bval"))): _*)).as("bb"))
      .select(col("sh"), col("ids"),
        col("bb.band").as("band"), col("bb.bval").as("bval"))
    val firstAgreeingBand = (0 until bands).foldRight(lit(bands)) { (b, rest) =>
      when(bitSlice(col("sh_a"), b) === bitSlice(col("sh_b"), b), lit(b))
        .otherwise(rest)
    }
    val inter = bandRows
      .select(col("band"), col("bval"), col("sh").as("sh_a"), col("ids").as("ids_a"))
      .join(bandRows
        .select(col("band"), col("bval"), col("sh").as("sh_b"), col("ids").as("ids_b")),
        Seq("band", "bval"))
      .filter(col("sh_a") < col("sh_b") && col("band") === firstAgreeingBand)
      .withColumn("hamming", hammingDist32(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select(explode(col("ids_a")).as("x"), col("ids_b"), col("hamming"))
      .select(col("x"), explode(col("ids_b")).as("y"), col("hamming"))
      .select(least(col("x"), col("y")).as("id_a"),
        greatest(col("x"), col("y")).as("id_b"),
        col("hamming").cast("long").as("hamming"))

    intra.unionByName(inter)
  }
}
