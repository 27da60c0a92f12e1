package graft.functions

import scala.collection.mutable

/** F1 — real byte-pair-encoding token counting behind the `Pipeline.run(
  * tokenizer=)` seam (VERDICT r2 "Next round" #4). The reference counts
  * BPE tokens with a published tokenizer (auto_translate.py:259-260);
  * this is the same public algorithm family, self-contained:
  *
  *  - GPT-2-style pre-tokenization with the leading-space convention
  *    (a token owns the space before it, marked 'Ġ' = U+0120 like the
  *    published merges format), simplified to ASCII classes and kept
  *    lookahead-free so the exact same pattern runs under both Java
  *    regex (Spark side) and RE2 (DuckDB oracle side).
  *  - Merging follows the published tiktoken loop: repeatedly merge the
  *    single minimum-rank adjacent pair (leftmost wins rank ties) until
  *    no adjacent pair is in the merges table. This is deliberately the
  *    one-pair-at-a-time variant, not "merge all occurrences per rank",
  *    because it is SQL-replayable step-by-step (one recursive-CTE
  *    iteration = one merge) — see [[oracleCte]].
  *  - The merges table ships as a resource (`graft/bpe_merges.txt`,
  *    published `left right` line format), trained with the classic
  *    most-frequent-pair loop (Sennrich et al. 2016) by
  *    [[graft.tools.TrainBpe]] on the documents corpus. Swap the file to
  *    swap vocabularies.
  *
  * Unknown characters never fail: every single character is a token, so
  * out-of-vocabulary input just merges less.
  */
object Bpe {

  /** Leading-space marker, as in the published GPT-2 merges format. Using
    * it keeps tokens space-free, so `left right` merge lines stay
    * unambiguous.
    */
  val SpaceMark: Char = 'Ġ' // Ġ

  /** ASCII pre-tokenizer: a word/number/punct run optionally owning one
    * leading space, or a whitespace run. No lookahead, no `\s` (Java and
    * RE2 disagree on `\s` membership), so Spark and the DuckDB oracle can
    * run the IDENTICAL pattern.
    */
  val PreTokenRegex: String =
    " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\r\\n\\f]+|[ \\t\\r\\n\\f]+"

  private val preTokenPattern = java.util.regex.Pattern.compile(PreTokenRegex)

  /** Split into pre-tokens with spaces mapped to [[SpaceMark]]. */
  def preTokenize(text: String): Vector[String] = {
    val m = preTokenPattern.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group().replace(' ', SpaceMark)
    out.result()
  }

  /** tiktoken-style merge loop over one pre-token: find the adjacent pair
    * with the minimum rank (leftmost on ties), merge it, repeat.
    */
  def encodePiece(piece: String,
                  ranks: collection.Map[(String, String), Int]): List[String] = {
    val parts = mutable.ArrayBuffer.empty[String]
    piece.foreach(ch => parts += ch.toString)
    var merging = parts.length > 1
    while (merging) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) merging = false
      else {
        parts(bestIdx) = parts(bestIdx) + parts(bestIdx + 1)
        parts.remove(bestIdx + 1)
        merging = parts.length > 1
      }
    }
    parts.toList
  }

  /** Token count of one pre-token, memoized: corpora repeat pre-tokens
    * constantly (the published tokenizers keep the same cache), so the
    * steady-state cost per pre-token is one hash lookup. Bounded to keep
    * executors safe on adversarial vocabularies.
    */
  private val pieceCache = new java.util.concurrent.ConcurrentHashMap[String, Int]()
  private val PieceCacheMax = 100000

  private def pieceLen(piece: String,
                       ranks: collection.Map[(String, String), Int]): Int = {
    if (!(ranks eq defaultRanks)) encodePiece(piece, ranks).length // custom vocab: no shared cache
    else {
      val hit = pieceCache.get(piece) // null unboxes to 0; real counts are >= 1
      if (hit != 0) hit
      else {
        val n = encodePiece(piece, ranks).length
        if (pieceCache.size < PieceCacheMax) pieceCache.put(piece, n)
        n
      }
    }
  }

  def countTokens(text: String,
                  ranks: collection.Map[(String, String), Int]): Long = {
    var total = 0L
    preTokenize(text).foreach(p => total += pieceLen(p, ranks))
    total
  }

  // ------------------------------------------------------ default merges

  /** Merges from the committed resource, in training order (= rank). */
  lazy val defaultMerges: Vector[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "missing resource graft/bpe_merges.txt — run graft.tools.TrainBpe")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val sp = line.indexOf(' ')
      (line.substring(0, sp), line.substring(sp + 1))
    }.toVector
    finally src.close()
  }

  lazy val defaultRanks: Map[(String, String), Int] =
    defaultMerges.zipWithIndex.toMap

  /** Entry point the Catalyst expression codegen calls (static-style). */
  def countTokensDefault(text: String): Long = countTokens(text, defaultRanks)

  // ------------------------------------------------------------ training

  /** Classic BPE training (Sennrich et al. 2016): start from characters,
    * repeatedly merge the most frequent adjacent pair (lexicographically
    * smallest pair on count ties, for determinism), until `numMerges`
    * merges or no pair occurs at least twice.
    */
  def train(pieceFreq: collection.Map[String, Long], numMerges: Int): Vector[(String, String)] = {
    var words: Map[Vector[String], Long] =
      pieceFreq.foldLeft(Map.empty[Vector[String], Long]) { case (acc, (w, f)) =>
        val syms = w.map(_.toString).toVector
        acc.updated(syms, acc.getOrElse(syms, 0L) + f)
      }
    val merges = Vector.newBuilder[(String, String)]
    var step = 0
    var converged = false
    while (step < numMerges && !converged) {
      val pairs = mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairs.update(p, pairs.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (pairs.isEmpty) converged = true
      else {
        val maxCount = pairs.valuesIterator.max
        if (maxCount < 2) converged = true
        else {
          val (a, b) = pairs.iterator.collect { case (p, c) if c == maxCount => p }
            .min(Ordering.Tuple2(Ordering.String, Ordering.String))
          merges += ((a, b))
          words = words.foldLeft(Map.empty[Vector[String], Long]) { case (acc, (syms, f)) =>
            val merged = mergeWord(syms, a, b)
            acc.updated(merged, acc.getOrElse(merged, 0L) + f)
          }
          step += 1
        }
      }
    }
    merges.result()
  }

  /** Left-to-right non-overlapping merge of (a,b) within one word. */
  private[functions] def mergeWord(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  // ---------------------------------------------------------- oracle SQL

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The merges table as an inline DuckDB list literal; `list_position`
    * over it IS the rank (1-based — only the ordering matters).
    */
  def mergesSqlList: String =
    defaultMerges.map { case (a, b) => sqlQuote(a + " " + b) }.mkString("[", ", ", "]")

  /** DuckDB CTE block replaying the encoder exactly: `words` = distinct
    * pre-tokens of `table`.`textCol` (space → chr(288) = Ġ), `enc`
    * iterates ONE tiktoken merge per recursion step (minimum-rank pair,
    * leftmost on ties via (r, i) struct sort), `bpe_wtok(w, n)` = final
    * token count per pre-token, `bpe_doc_tok(<keyCol>, w)` = the
    * pre-token multiset per row. Callers join and sum.
    */
  def oracleCte(table: String, keyCol: String, textCol: String): String = {
    // The runtime string already holds backslash-t etc. — RE2 reads the
    // same escapes as java.util.regex, so it is passed through verbatim.
    val pretok = sqlQuote(PreTokenRegex)
    s"""words AS (
       |  SELECT DISTINCT replace(tok, ' ', chr(288)) AS w
       |  FROM (SELECT unnest(regexp_extract_all($textCol, $pretok)) AS tok FROM $table)
       |),
       |enc AS (
       |  SELECT w, regexp_extract_all(w, '(?s).') AS parts, false AS done FROM words
       |  UNION ALL
       |  SELECT w,
       |    CASE WHEN struct_extract(b, 'r') >= 2000000000 THEN parts
       |         ELSE parts[1:struct_extract(b, 'i')-1] ||
       |              [parts[struct_extract(b, 'i')] || parts[struct_extract(b, 'i')+1]] ||
       |              parts[struct_extract(b, 'i')+2:len(parts)] END AS parts,
       |    struct_extract(b, 'r') >= 2000000000 AS done
       |  FROM (
       |    SELECT w, parts,
       |      list_sort([{'r': coalesce(list_position($mergesSqlList,
       |                                parts[i] || ' ' || parts[i+1]), 2000000000), 'i': i}
       |                 for i in range(1, len(parts))] || [{'r': 2000000000, 'i': 0}])[1] AS b
       |    FROM enc WHERE NOT done) s
       |),
       |bpe_wtok AS (SELECT w, len(parts) AS n FROM enc WHERE done),
       |bpe_doc_tok AS (
       |  SELECT $keyCol, replace(tok, ' ', chr(288)) AS w
       |  FROM (SELECT $keyCol, unnest(regexp_extract_all($textCol, $pretok)) AS tok FROM $table)
       |)""".stripMargin
  }
}
