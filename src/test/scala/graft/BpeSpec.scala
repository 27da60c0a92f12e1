package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bpe, TextFunctions}
import graft.plans.GraftFunctions

/** F1 — real BPE tokenizer: algorithm semantics (tiktoken-style
  * minimum-rank merge walk), the trained default vocabulary, the native
  * expression, and the pipeline seam. The FIXTURES-sentence counts are
  * pinned against an INDEPENDENT implementation of the same published
  * algorithm run over the committed merges table.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val tinyRanks = Map(("a", "b") -> 0, ("ab", "c") -> 1)

  test("encodePiece merges the minimum-rank pair first, repeatedly") {
    // a,b,c,a,b,d -> ab,c,a,b,d -> ab,c,ab,d -> abc,ab,d
    assert(Bpe.encodePiece("abcabd", tinyRanks) === List("abc", "ab", "d"))
  }

  test("rank ties merge leftmost (aaa with (a,a) gives [aa, a])") {
    assert(Bpe.encodePiece("aaa", Map(("a", "a") -> 0)) === List("aa", "a"))
  }

  test("unknown characters never fail — they stay single-char tokens") {
    assert(Bpe.encodePiece("xyz", tinyRanks) === List("x", "y", "z"))
    assert(Bpe.countTokens("", tinyRanks) === 0L)
  }

  test("pre-tokenization follows the leading-space convention") {
    assert(Bpe.preTokenize("hello world") === Vector("hello", "Ġworld"))
    assert(Bpe.preTokenize(" hello") === Vector("Ġhello"))
    assert(Bpe.preTokenize("x2 (y)") === Vector("x", "2", "Ġ(", "y", ")"))
    // a double space is one whitespace-run token; the word after it gets
    // no leading-space mark (the run consumed both spaces)
    assert(Bpe.preTokenize("a  b") === Vector("a", "ĠĠ", "b"))
  }

  test("token concatenation always reconstructs the piece") {
    val pieces = Seq("abcabd", "aaa", "Ġscan", "mixed42!?", "x")
    pieces.foreach { p =>
      assert(Bpe.encodePiece(p, Bpe.defaultRanks).mkString === p)
      assert(Bpe.encodePiece(p, tinyRanks).mkString === p)
    }
  }

  test("trained vocabulary collapses corpus words to single tokens") {
    // the merges table converged on the documents vocabulary, so every
    // in-vocab word (with its leading space) is one token
    assert(Bpe.countTokensDefault("key agg row scan slow fast table value part hash") === 10L)
    assert(Bpe.countTokensDefault("spark window batch") === 3L)
  }

  test("FIXTURES sentences match the independent reference implementation") {
    // counts computed with a separate implementation of the same
    // published merge walk (prototyped in Python) over the committed
    // merges table — cross-implementation parity on out-of-domain text
    val expected = Seq(
      "Low fuel pressure detected at the fuel delivery pressure sensor" -> 49L,
      "A performance fault with the Intake Air Temperature (IAT) sensor detected" -> 60L,
      "Longitudinal Acceleration Threshold Exceeded" -> 40L,
      "Ignition Run/Act Circuit Open" -> 28L,
      "Check engine coolant level" -> 21L)
    expected.foreach { case (s, n) =>
      assert(Bpe.countTokensDefault(s) === n, s"for: $s")
    }
  }

  test("BpeTokenCount expression: codegen, interpreted, null, SQL") {
    GraftFunctions.register(spark)
    val e = graft.plans.BpeTokenCount(
      org.apache.spark.sql.catalyst.expressions.Literal("spark window batch"))
    assert(e.eval(null) === 3L) // interpreted path
    assert(spark.sql("SELECT graft_bpe_token_count('spark window batch')")
      .as[Long].head() === 3L) // codegen path
    assert(spark.sql("SELECT graft_bpe_token_count(NULL)").head().isNullAt(0))
    val viaColumn = Seq("key agg row", "").toDF("t")
      .select(TextFunctions.bpeTokenCount($"t")).as[Long].collect().toSeq
    assert(viaColumn === Seq(3L, 0L))
  }

  test("BPE tokenizer plugs into the pipeline seam and changes packing only") {
    GraftFunctions.register(spark)
    // all-in-vocab words: BPE counts 1 token/word (14), while the
    // ~4-chars/token approximation sees ~19 — enough to move batch
    // boundaries under the same budget
    val input = Seq.tabulate(30)(i =>
      (i.toLong, i.toString,
        "key agg row scan slow fast table value part hash merge sort group filter"))
      .toDF("pos", "description_id", "english_sentence")
    val r = Pipeline.run(input, new graft.translate.MockTranslator(),
      budget = 400, numPartitions = 1,
      tokenizer = TextFunctions.bpeTokenCount)
    assert(r.output.count() === 30)
    // BPE counts are far smaller than ~4-chars/token, so the same budget
    // packs more rows per batch than the approximation does
    def batches(tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      graft.operators.Batching.assignBatches(
          input.withColumn("tokens", tok(col("english_sentence")).cast("long")),
          budget = 400, baseCost = 0, numPartitions = 1)
        .select("custom_id").distinct().count()
    assert(batches(TextFunctions.bpeTokenCount) < batches(TextFunctions.approxTokenCount))
  }
}
