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

  /** SimHash-banded near-duplicate pairs (north-star brief: SimHash
    * dedup): the 32-bit simhash splits into `bands` equal bit-slices and
    * documents sharing any slice value become candidates. By pigeonhole,
    * hamming(a,b) <= bands-1 forces at least one identical slice, so at
    * the default (bands=4, maxHamming=3) candidate generation is EXACT —
    * no near-dup under the verify threshold can be missed. Candidates are
    * then verified with the exact [[hammingDist32]].
    *
    * Scale: one simhash projection over the corpus, then a self-join that
    * shuffles only (band, slice-value, sh, id) rows — 4 rows of a few
    * dozen bytes per document, never text — and per-bucket width is
    * corpus/2^8 in expectation per band; the verify runs on candidate
    * rows only (the 8-byte signatures travel with the band rows, so no
    * second join back to the corpus — same shape as
    * [[MinHashLSH.nearDupPairs]] after the r2 verdict fix). A pair whose
    * slices agree in several bands would be emitted once per band; since
    * both full signatures ride on the joined row, keeping only the FIRST
    * agreeing band dedups exactly-once as a stateless per-row filter — no
    * distinct() exchange over the (quadratic) candidate set.
    */
  def simhashNearDup(docs: org.apache.spark.sql.DataFrame,
                     idCol: String, textCol: String,
                     bands: Int = 4, maxHamming: Int = 3): org.apache.spark.sql.DataFrame = {
    require(32 % bands == 0, s"bands must divide 32, got $bands")
    val width = 32 / bands
    val mask = (1L << width) - 1
    def slice(sh: Column, b: Int): Column =
      shiftright(sh, b * width).bitwiseAND(mask)
    val bandRows = docs
      .select(col(idCol).cast("long").as("id"),
        simhash32(col(textCol)).as("sh"))
      .select(col("id"), col("sh"),
        explode(array((0 until bands).map(b => struct(
          lit(b).as("band"), slice(col("sh"), b).as("bval"))): _*))
          .as("bb"))
      .select(col("id"), col("sh"), col("bb.band").as("band"), col("bb.bval").as("bval"))
    val left = bandRows
      .select(col("band"), col("bval"), col("id").as("id_a"), col("sh").as("sh_a"))
    val right = bandRows
      .select(col("band"), col("bval"), col("id").as("id_b"), col("sh").as("sh_b"))
    val firstAgreeingBand = (0 until bands).foldRight(lit(bands)) { (b, rest) =>
      when(slice(col("sh_a"), b) === slice(col("sh_b"), b), lit(b)).otherwise(rest)
    }
    left.join(right, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b") && col("band") === firstAgreeingBand)
      .withColumn("hamming", hammingDist32(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }
}
