package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of the graft function surface so SQL and DataFrame callers
  * share one implementation (SURVEY.md §7 build plan item 3).
  *
  * Two entry points:
  *  - `GraftExtensions` for the builder path:
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.plans.GraftExtensions`;
  *  - `GraftFunctions.register(spark)` for a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  /** (name, info, builder) for every injected function. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_token_count",
      info("graft_token_count", "approximate token count (~4 chars/token)"),
      (args: Seq[Expression]) => TokenCountApprox(args.head)),
    ("graft_is_suspicious",
      info("graft_is_suspicious", "true when a translation value looks like a failure artifact"),
      (args: Seq[Expression]) => new IsSuspiciousTranslation(args.head)),
    ("graft_bpe_token_count",
      info("graft_bpe_token_count", "BPE token count over the committed merges table"),
      (args: Seq[Expression]) => BpeTokenCount(args.head)),
    ("graft_minhash_sig",
      info("graft_minhash_sig", "MinHash signature of a shingle array (numHashes minima)"),
      (args: Seq[Expression]) => MinHashSignature(args(0), args(1))),
    ("graft_char_shingles",
      info("graft_char_shingles", "distinct character k-shingles of a text column"),
      (args: Seq[Expression]) => CharShingles(args(0), args(1))),
    ("graft_word_shingles",
      info("graft_word_shingles", "distinct word n-gram shingles of a text column"),
      (args: Seq[Expression]) => WordShingles(args(0), args(1))),
    ("graft_simhash32",
      info("graft_simhash32", "32-bit SimHash of a text column"),
      (args: Seq[Expression]) => SimHash32(args.head)),
    ("graft_cosine",
      info("graft_cosine", "cosine similarity of two float/double vectors"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    ("graft_l2sq",
      info("graft_l2sq", "squared L2 distance of two float/double vectors"),
      (args: Seq[Expression]) => L2Sq(args(0), args(1))),
    ("graft_hyperplane_bucket",
      info("graft_hyperplane_bucket",
        "hyperplane-LSH bucket id of a float/double vector"),
      (args: Seq[Expression]) =>
        HyperplaneBucket(args(0), args(1), args(2), args(3))),
    ("graft_rolling_hash",
      info("graft_rolling_hash",
        "Karp-Rabin rolling hash over a text column's code points"),
      (args: Seq[Expression]) => RollingHash(args.head)),
    ("graft_lang_id",
      info("graft_lang_id",
        "heuristic function-word language ID (en/de/fr/es/unknown)"),
      (args: Seq[Expression]) => LangId(args.head)))

  /** [[register]] at most once per session — the idempotent form library
    * code calls internally (plain register logs a "replaced function"
    * warning per call).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("graft_minhash_sig")))
      // expressions only: the UDF helpers need Scala-lambda reflection,
      // which fails in REPL-loader environments and is not needed by
      // library internals (they resolve call_function against `all`)
      all.foreach { case (name, i, builder) =>
        spark.sessionState.functionRegistry
          .registerFunction(FunctionIdentifier(name), i, builder)
      }

  /** Register the expression-backed functions plus the UDF-backed parse
    * helpers on a live session.
    */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
    // non-expressible helpers go through the regular UDF registry
    spark.udf.register("graft_repair_json",
      (s: String) => graft.functions.ParseFunctions.repairJsonS(s))
    spark.udf.register("graft_parse_fallback",
      (s: String) => graft.functions.ParseFunctions.parseFallbackS(s))
  }
}
