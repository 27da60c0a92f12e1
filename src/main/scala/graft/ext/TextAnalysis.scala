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
    */
  def langId(text: Column): Column = {
    val scores = langWords.map { case (l, _) => l -> langScore(text, l) }
    val all = scores.map(_._2)
    scores.foldRight(lit("unknown")) { case ((l, s), rest) =>
      when(s > 0 && all.map(o => s >= o).reduce(_ && _), lit(l)).otherwise(rest)
    }
  }

  /** Karp-Rabin-style rolling hash over the character stream:
    * h = (h * 31 + code) mod 10^15+37. The modulus keeps every
    * intermediate under 2^62 so the fold never overflows a long, and the
    * arithmetic is plain integer ops any SQL engine reproduces exactly.
    */
  val RollMod: Long = 1000000000000037L

  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, code) => (acc * 31 + code) % RollMod)

  /** 32-bit text SimHash over whitespace tokens: token hashes vote ±1 per
    * bit position; the sign of each bit-sum sets the output bit
    * (Charikar '02). Uses the portable 60-bit md5 hash so a SQL oracle
    * replays it bit-for-bit.
    */
  def simhash32(text: Column): Column = {
    val hashes = transform(words(text), t => MinHashLSH.hash60(0, t))
    (0 until 32).map { j =>
      val bitSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(1) * 2 - 1))
      when(bitSum > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash values (for near-dup banding). */
  def hammingDist32(a: Column, b: Column): Column =
    (0 until 32).map { j =>
      shiftright(a.bitwiseXOR(b), j).bitwiseAND(1)
    }.reduce(_ + _)
}
