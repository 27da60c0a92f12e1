package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.plans.{GraftFunctions, TokenCountApprox}

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("TokenCountApprox matches the Column-expression token counter") {
    GraftFunctions.register(spark)
    val texts = Seq("", "a", "abcd", "abcde", "exactly sixteen.",
      "a much longer sentence with many characters in it")
    val df = texts.toDF("t")
    val got = df.selectExpr("graft_token_count(t)").as[Long].collect().toSeq
    val want = df.select(TextFunctions.approxTokenCount($"t")).as[Long].collect().toSeq
    assert(got === want)
  }

  test("TokenCountApprox survives both codegen and interpreted eval") {
    val e = TokenCountApprox(org.apache.spark.sql.catalyst.expressions.Literal("abcdefgh"))
    assert(e.eval(null) === 2L)
    // via SQL (codegen path)
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_token_count('abcdefgh')").as[Long].head() === 2L)
    assert(spark.sql("SELECT graft_token_count('')").as[Long].head() === 0L)
    assert(spark.sql("SELECT graft_token_count(NULL)").head().isNullAt(0))
  }

  test("IsSuspiciousTranslation matches the P3 Column predicate in SQL") {
    GraftFunctions.register(spark)
    val vals = Seq("null", "error", "ok", "42", "a proper value", "```json",
      "<tag>", "ab", "healthy text")
    val df = vals.toDF("v")
    df.createOrReplaceTempView("p3v")
    val viaSql = spark.sql("SELECT v, graft_is_suspicious(v) AS s FROM p3v")
      .as[(String, Boolean)].collect().toMap
    val viaCol = df.select($"v", TextFunctions.isSuspicious($"v").as("s"))
      .as[(String, Boolean)].collect().toMap
    assert(viaSql === viaCol)
  }

  test("UDF-backed repair helper is SQL-callable") {
    GraftFunctions.register(spark)
    val repaired = spark.sql(
      """SELECT graft_repair_json('{"a": "good value here"') AS r""")
      .as[String].head()
    assert(repaired === """{"a": "good value here"}""")
  }

  test("shingle k argument is type-checked at analysis time, not eval time") {
    GraftFunctions.register(spark)
    // a merely-foldable non-integral k (string literal, NULL) must fail
    // ANALYSIS, not blow up later inside eval/codegen (ADVICE r6)
    Seq("graft_char_shingles('abcdef', '5')",
        "graft_char_shingles('abcdef', NULL)",
        "graft_word_shingles('a b c', '2')",
        "graft_word_shingles('a b c', NULL)").foreach { bad =>
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $bad").collect()
      }
      assert(e.getMessage.toLowerCase.contains("foldable non-null int"),
        s"$bad: wrong error: ${e.getMessage}")
    }
    // integral k still works, INT or LONG
    assert(spark.sql("SELECT size(graft_char_shingles('abcdef', 5))")
      .as[Int].head() === 2)
    assert(spark.sql("SELECT size(graft_char_shingles('abcdef', CAST(5 AS BIGINT)))")
      .as[Int].head() === 2)
  }

  test("extensions class injects the same functions at builder time") {
    // derive the expected set from the registry itself (single source of
    // truth — a hard-coded name list here desynced in r5 when
    // graft_char_shingles was added) and verify every entry actually
    // resolves in a registered session, with no duplicate names
    val names = graft.plans.GraftFunctions.all.map(_._1)
    assert(names.distinct.size === names.size, "duplicate function names")
    assert(names.nonEmpty && names.forall(_.startsWith("graft_")))
    GraftFunctions.register(spark)
    names.foreach { n =>
      assert(spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n)),
        s"registered session cannot resolve $n")
    }
    // and the class instantiates cleanly for spark.sql.extensions use, and
    // injects exactly the `all` entries into a fresh extensions object
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
  }
}
