package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot scalar functions (SURVEY.md §7
  * "custom Expression (optional, perf/codegen)"): these run inside
  * whole-stage codegen with no UDF boxing, and SQL callers reach them via
  * GraftFunctions/GraftExtensions.
  */

/** F1 — approximate token count (~4 chars/token, 0 for empty), with a
  * hand-written doGenCode so the counter inlines into generated code:
  * `n == 0 ? 0 : (n + 3) / 4` over the UTF8 character count. Matches
  * TextFunctions.approxTokenCount exactly (ceil(n/4.0) == (n+3)/4 for
  * non-negative ints).
  */
case class TokenCountApprox(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | org.apache.spark.sql.types.NullType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_token_count expects STRING, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_count"

  override def nullSafeEval(input: Any): Any = {
    val n = input.asInstanceOf[UTF8String].numChars()
    if (n == 0) 0L else ((n + 3) / 4).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"($c.numChars() == 0) ? 0L : (long)(($c.numChars() + 3) / 4)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** P3 — is_suspicious_translation (auto_translate.py:649-672) as a
  * RuntimeReplaceable: the analyzer swaps it for a tree of built-in
  * expressions (trim/lower/in/rlike/length), so it inherits their codegen
  * while presenting one named function to SQL and the optimizer.
  */
case class IsSuspiciousTranslation(input: Expression, replacement: Expression)
    extends RuntimeReplaceable with InheritAnalysisRules {

  def this(input: Expression) = this(input, {
    val t = StringTrim(input)
    val denylist = graft.functions.TextFunctions.suspiciousDenylist
      .map(s => Literal(UTF8String.fromString(s), StringType))
    Seq[Expression](
      IsNull(input),
      In(Lower(t), denylist),
      RLike(t, Literal("^(```|<|\\{|\\[)")),
      LessThan(Length(t), Literal(3)),
      RLike(t, Literal("^[0-9]+$"))
    ).reduce(Or(_, _))
  })

  override def parameters: Seq[Expression] = Seq(input)
  override def prettyName: String = "graft_is_suspicious"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(replacement = newChild)
}

/** F1 — real BPE token count over the committed merges table
  * (graft/bpe_merges.txt; see [[graft.functions.Bpe]]). The generated
  * code is a single static-style call into the JVM encoder — the same
  * shape Spark uses for its own regexp/JSON expressions — so the
  * expression stays inside whole-stage codegen with no UDF boxing, and
  * the memoized piece cache makes the steady-state cost one hash lookup
  * per pre-token.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | org.apache.spark.sql.types.NullType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_token_count expects STRING, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    graft.functions.Bpe.countTokensDefault(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Bpe.countTokensDefault($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature (array of universal-hash minima over a shingle
  * array) as a native expression. The composed Column form
  * (MinHashLSH.signatureFromHashes — an `aggregate` over a `transform`)
  * is the SQL-replayable specification, but Spark evaluates higher-order
  * functions interpreted per element, which made signatures the dominant
  * cost of the near-dup pipeline; this expression runs the identical
  * arithmetic as one tight JVM loop (thread-local MD5, hoisted
  * coefficients) callable from whole-stage codegen. `numHashes` must be
  * a foldable integer.
  */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val numHashes: Int = right.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_minhash_sig numHashes must be a foldable integer, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_minhash_sig expects (ARRAY<STRING>, foldable INT)")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(arr: Any, n: Any): Any =
    graft.ext.MinHashLSH.signatureJvm(
      arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (arr, _) =>
      s"graft.ext.MinHashLSH.signatureJvm($arr, $numHashes)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Shared shape of the native vector-math expressions (cosine, squared
  * L2): two float/double array children, a DOUBLE result, and a boxed
  * JVM helper whose null return (unequal lengths — matching zip_with's
  * null padding in the composed specification) becomes SQL null. The
  * element-type flags are resolved once from the children's types and
  * baked into the generated code.
  */
abstract class VectorMathExpression extends BinaryExpression {

  /** Fully qualified JVM helper, e.g. "graft.ext.Similarity.cosineJvm". */
  protected def helper: String

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ArrayType(FloatType, _) => true
    case _ => false
  }
  protected lazy val aFloat: Boolean = isFloatArray(left.dataType)
  protected lazy val bFloat: Boolean = isFloatArray(right.dataType)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (org.apache.spark.sql.types.ArrayType(FloatType | DoubleType, _),
          org.apache.spark.sql.types.ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<FLOAT|DOUBLE> arguments")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def evalJvm(
      a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double

  override def nullSafeEval(a: Any, b: Any): Any =
    evalJvm(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("boxed")
      s"""java.lang.Double $tmp = $helper($a, $b, $aFloat, $bFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })
}

/** Cosine similarity of two vectors as a native expression: the composed
  * form (Similarity.cosineSpec) is three interpreted `aggregate` folds
  * per pair, which dominated the verify stages of the ANN family; this
  * runs the identical left-to-right double arithmetic in one JVM loop.
  */
case class CosineSim(left: Expression, right: Expression)
    extends VectorMathExpression {
  override protected def helper: String = "graft.ext.Similarity.cosineJvm"
  override def prettyName: String = "graft_cosine"
  override protected def evalJvm(
      a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double =
    graft.ext.Similarity.cosineJvm(a, b, aFloat, bFloat)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance of two vectors as a native expression (the IVF
  * assignment/search hot loop; composed spec: Similarity.l2sqSpec).
  */
case class L2Sq(left: Expression, right: Expression)
    extends VectorMathExpression {
  override protected def helper: String = "graft.ext.Similarity.l2sqJvm"
  override def prettyName: String = "graft_l2sq"
  override protected def evalJvm(
      a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double =
    graft.ext.Similarity.l2sqJvm(a, b, aFloat, bFloat)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Heuristic language ID of a text column as a native expression: the
  * composed form (TextAnalysis.langIdSpec) re-splits the text once per
  * language and filters each token array with interpreted lambdas; this
  * tokenizes once and scores all four function-word lists via hash
  * lookups in one JVM pass (TextAnalysis.langIdJvm).
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_lang_id expects a STRING argument")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"

  // NULL text classifies as "unknown", never as NULL — the composed
  // when-chain's ELSE branch fires for null input (every condition is
  // null), and both DuckDB oracles (CASE ... ELSE 'unknown') agree; a
  // default null-intolerant eval would silently diverge on null rows.
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) graft.ext.TextAnalysis.langIdUnknown()
    else graft.ext.TextAnalysis.langIdJvm(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    ev.copy(
      code = childGen.code +
        code"""
          UTF8String ${ev.value} = ${childGen.isNull} ?
            graft.ext.TextAnalysis.langIdUnknown() :
            graft.ext.TextAnalysis.langIdJvm(${childGen.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Karp-Rabin rolling hash of a text column as a native expression: the
  * composed form (TextAnalysis.rollingHashSpec) splits each row into a
  * per-character string ARRAY and folds it with two interpreted
  * higher-order passes — allocation-bound on document-sized text; this
  * is one JVM loop over the code points (TextAnalysis.rollingHashJvm),
  * callable from whole-stage codegen.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_rolling_hash expects a STRING argument")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(text: Any): Any =
    graft.ext.TextAnalysis.rollingHashJvm(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.ext.TextAnalysis.rollingHashJvm($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hyperplane-LSH bucket id of a vector as a native expression: the
  * composed form (Similarity.bucketSpec) evaluates `bits` interpreted
  * zip_with + aggregate folds per vector — the corpus-sized projection
  * of every bucketed-ANN and embedding-near-dup query; this runs the
  * identical left-to-right double arithmetic (LCG plane coefficients,
  * sign-bit packing) as one JVM loop callable from whole-stage codegen.
  * `bits`, `dims`, and `planeOffset` must be foldable non-null integers.
  */
case class HyperplaneBucket(first: Expression, second: Expression,
                            third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  private def foldInt(e: Expression, what: String): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_hyperplane_bucket $what must be a foldable integer, got $other")
  }
  private lazy val bits = foldInt(second, "bits")
  private lazy val dims = foldInt(third, "dims")
  private lazy val off = foldInt(fourth, "planeOffset")

  private lazy val vFloat: Boolean = first.dataType match {
    case org.apache.spark.sql.types.ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case org.apache.spark.sql.types.ArrayType(FloatType | DoubleType, _)
        if Seq(second, third, fourth).forall(e => e.foldable &&
          (e.dataType == IntegerType || e.dataType == LongType) &&
          e.eval(null) != null) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_hyperplane_bucket expects (ARRAY<FLOAT|DOUBLE>, " +
        "foldable non-null INT bits, dims, planeOffset)")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hyperplane_bucket"

  override def nullSafeEval(v: Any, b: Any, d: Any, o: Any): Any =
    graft.ext.Similarity.hyperplaneBucketJvm(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vFloat, bits, dims, off)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _, _) => {
      val tmp = ctx.freshName("boxed")
      s"""java.lang.Long $tmp =
         |  graft.ext.Similarity.hyperplaneBucketJvm($v, $vFloat, $bits, $dims, $off);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** 32-bit text SimHash as a native expression: the composed form
  * (TextAnalysis.simhash32Spec) folds the token-hash array 32 times per
  * row with interpreted higher-order functions, which made the signature
  * projection the dominant cost of simhash near-dup detection; this is
  * one JVM loop per row (TextAnalysis.simhash32Jvm — one md5 per token,
  * 32 int votes) callable from whole-stage codegen.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | org.apache.spark.sql.types.NullType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash32 expects STRING, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"

  override def nullSafeEval(input: Any): Any =
    graft.ext.TextAnalysis.simhash32Jvm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ext.TextAnalysis.simhash32Jvm($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct character k-shingles of a text column, as a native
  * expression: the composed form (sequence → transform(substr) →
  * array_distinct) evaluates one interpreted transform element per
  * CHARACTER of text, which made the exact-Jaccard and signature
  * queries the bench's slowest; this is one JVM loop
  * (MinHashLSH.charShinglesJvm) callable from whole-stage codegen, with
  * the composed form retained as the SQL-replayable specification
  * (MinHashLSH.shinglesSpec). `k` must be a foldable integer.
  */
case class CharShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val k: Int = right.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_char_shingles k must be a foldable integer, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    // require an integral, non-null k at ANALYSIS time: a merely-foldable
    // k (lit("5"), lit(null)) would otherwise pass here and blow up later
    // in eval/codegen (ADVICE r5)
    case StringType if right.foldable &&
        (right.dataType == IntegerType || right.dataType == LongType) &&
        right.eval(null) != null =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_char_shingles expects (STRING, foldable non-null INT)")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_shingles"

  override def nullSafeEval(text: Any, kk: Any): Any =
    graft.ext.MinHashLSH.charShinglesJvm(text.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, _) =>
      s"graft.ext.MinHashLSH.charShinglesJvm($t, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Distinct word n-gram shingles of a text column, as a native
  * expression: the composed form (split → sequence → transform →
  * concat_ws → array_distinct) is four interpreted higher-order passes
  * per row; this is one JVM loop (MinHashLSH.wordShinglesJvm), callable
  * from whole-stage codegen, with the composed form retained as the
  * SQL-replayable specification. `n` must be a foldable integer.
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val n: Int = right.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_word_shingles n must be a foldable integer, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    // analysis-time integral/non-null check, same rationale as CharShingles
    case StringType if right.foldable &&
        (right.dataType == IntegerType || right.dataType == LongType) &&
        right.eval(null) != null =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_word_shingles expects (STRING, foldable non-null INT)")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(text: Any, nn: Any): Any =
    graft.ext.MinHashLSH.wordShinglesJvm(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, _) =>
      s"graft.ext.MinHashLSH.wordShinglesJvm($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
