package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}

/** Native Catalyst form of the per-element fingerprint map
  * [[Text.fps]]: charFp applied to every shingle of an array<string> —
  * promoted from a Scala UDF (per-row Seq conversion) to a codegen'd
  * expression emitting a primitive long array. Same recurrence as
  * [[Text.charFpStr]] / `OracleDialect.fp` — the portability contract.
  * Null input → null; empty array → empty array (the UDF's behavior).
  */
case class FpsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_fps expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_fps"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = Text.charFpStr(arr.getUTF8String(i).toString); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $c.numElements();
         |final long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.functions.Text.charFpStr($c.getUTF8String($i).toString());
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FpsExpr =
    copy(child = newChild)
}

/** Native Catalyst form of the distinct-shingle kernel
  * [[Text.distinctShingles]] — the first stage of EVERY dedup query.
  * The string kernel itself stays [[Text.distinctShinglesStr]] (the
  * portability contract with the oracle's `shingles()` snippet); the
  * promotion removes the ScalaUDF converter layer and inlines into
  * whole-stage codegen via a single static call.
  */
case class DistinctShingles(child: Expression, n: Int = 3) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    Text.distinctShinglesArrayData(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Text.distinctShinglesArrayData($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
}

/** Native Catalyst form of the hashed-linear-classifier score
  * [[Text.classifierScoreStr]] — c04's model-based quality filter
  * (integer dot product over hashed token features).
  */
case class HashedClassifier(child: Expression, d: Int = 256) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_classifier expects a string input, got ${child.dataType}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_classifier"

  override def nullSafeEval(input: Any): Any =
    Text.classifierScoreStr(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString, d)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Text.classifierScoreStr($c.toString(), $d);")

  override protected def withNewChildInternal(newChild: Expression): HashedClassifier =
    copy(child = newChild)
}

/** Native Catalyst form of the passage-chunking kernel
  * [[Text.passagesStr]] (non-overlapping w-token groups, ragged tail
  * kept) — d09's per-doc stage.
  */
case class Passages(child: Expression, w: Int = 8) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_passages expects a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_passages"

  override def nullSafeEval(input: Any): Any =
    Text.passagesArrayData(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Text.passagesArrayData($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Passages =
    copy(child = newChild)
}

/** Native Catalyst form of the all-shingles kernel
  * [[Text.shinglesAll]] (duplicates kept, document order — the
  * frequency-counting twin of [[DistinctShingles]]).
  */
case class ShinglesAll(child: Expression, n: Int = 2) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles_all expects a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles_all"

  override def nullSafeEval(input: Any): Any =
    Text.shinglesAllArrayData(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Text.shinglesAllArrayData($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShinglesAll =
    copy(child = newChild)
}

/** Native Catalyst form of the overlapping-window fingerprint kernel
  * [[Text.windowFpsArr]] — d10's substring-level dedup stage: `w`-token
  * windows at stride `s` (tail window included), each reduced to its
  * portable charFp digest scan-side, so only array<bigint> leaves the
  * row. The DuckDB oracle rebuilds the same windows as strings and
  * applies the same fp recurrence.
  */
case class WindowFps(child: Expression, w: Int = 40, s: Int = 20)
    extends UnaryExpression {

  require(w >= 1, "graft_window_fps: w must be >= 1")
  require(s >= 1 && s <= w, "graft_window_fps: stride must be in [1, w]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_window_fps expects a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_window_fps"

  override def nullSafeEval(input: Any): Any =
    Text.windowFpsArrayData(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w, s)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Text.windowFpsArrayData($c, $w, $s);")

  override protected def withNewChildInternal(newChild: Expression): WindowFps =
    copy(child = newChild)
}

/** Native Catalyst form of the random-hyperplane LSH bucket
  * [[graft.functions.Vectors.lshBucket]]: bit p set iff
  * Σ_d v[d]·s(p,d) > 0, signs derived from the portable hash of
  * "p:d" (the symbolic contract the DuckDB oracle reproduces). The
  * sign matrix is embedded in the plan as a flat reference object;
  * the double loop inlines into whole-stage codegen.
  */
case class LshBucket(child: Expression, nPlanes: Int = 8, dim: Int = 64,
    planeOffset: Int = 0)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_lshbucket expects array<double>, got $t")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_lshbucket"

  // flat [p * dim + d]. DOUBLE-hashed on purpose: the parity of a bare
  // charFpStr("p:d") is SEPARABLE — the polynomial value never wraps
  // the modulus for short strings, 31^k is odd, so parity(hash) =
  // XOR of the chars' parities = f(p) XOR g(d). That makes the signs
  // matrix rank-1: every plane identical up to global sign, the "8-bit"
  // bucket space collapses to 2 values, and the LSH block join scans
  // HALF the corpus instead of ~1/2^nPlanes (caught round 7 by the
  // LshDialSpec saturation probe). Re-hashing the DECIMAL DIGITS of
  // the first hash mixes across the separable structure (digit carries
  // are nonlinear); the oracle mirrors the same two-level derivation.
  // planeOffset selects a disjoint slice of the plane family so banded
  // LSH (v05) draws independent planes per band: band b uses global
  // plane indices [b*bits, (b+1)*bits).
  @transient private lazy val signs: Array[Double] =
    Array.tabulate(nPlanes * dim)(i =>
      if (Text.charFpStr(Text.charFpStr(
          s"${planeOffset + i / dim}:${i % dim}").toString) % 2 == 1)
        1.0 else -1.0)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = math.min(dim, arr.numElements())
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var d = 0
      while (d < len) { acc += arr.getDouble(d) * signs(p * dim + d); d += 1 }
      if (acc > 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sgn = ctx.addReferenceObj("signs", signs, "double[]")
      val len = ctx.freshName("len")
      val bkt = ctx.freshName("bkt")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      s"""
         |final int $len = java.lang.Math.min($dim, $c.numElements());
         |int $bkt = 0;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $len; $d++) {
         |    $acc += $c.getDouble($d) * $sgn[$p * $dim + $d];
         |  }
         |  if ($acc > 0) $bkt |= (1 << $p);
         |}
         |${ev.value} = $bkt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** Native Catalyst form of the per-document token statistics
  * [[Text.tokenStats]] — (n_tokens, n_distinct, sum_len) as a struct
  * with the tuple field names (`_1`, `_2`, `_3`) the UDF version
  * produced, so every `.getField("_1")` call site is unchanged.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tokenstats expects a string input, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("_1", IntegerType, nullable = false),
    StructField("_2", IntegerType, nullable = false),
    StructField("_3", LongType, nullable = false)))

  override def prettyName: String = "graft_tokenstats"

  override def nullSafeEval(input: Any): Any =
    Text.tokenStatsRow(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Text.tokenStatsRow($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

/** Native Catalyst form of the per-doc term-frequency kernel
  * [[Text.termCountsArrayData]]: `array<struct<term, tf>>` computed
  * entirely in the scan — the doc-term matrix with ZERO tf shuffle
  * (t13's rewrite; `explode` of this replaces `explode(tokens) →
  * groupBy(doc_id, term)`).
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_termcounts expects a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_termcounts"

  override def nullSafeEval(input: Any): Any =
    Text.termCountsArrayData(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Text.termCountsArrayData($c);")

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

/** Native Catalyst form of the one-pass document-length +
  * per-query-term frequency kernel [[Text.queryTfRow]] — t14's scan
  * stage (r11): one tokenization, zero array materialization, vs the
  * interpreted tokens-HOF plus one array_remove copy per term per
  * pass. The terms ride as a codegen reference object.
  */
case class QueryTf(child: Expression, terms: Seq[String]) extends UnaryExpression {

  require(terms.nonEmpty, "graft_querytf needs at least one query term")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_querytf expects a string input, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("dl", IntegerType, nullable = false),
    StructField("tf", ArrayType(IntegerType, containsNull = false), nullable = false)))

  override def prettyName: String = "graft_querytf"

  private lazy val termsArr: Array[String] = terms.toArray

  override def nullSafeEval(input: Any): Any =
    Text.queryTfRow(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], termsArr)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { c =>
      val t = ctx.addReferenceObj("terms", termsArr, "java.lang.String[]")
      s"${ev.value} = graft.functions.Text.queryTfRow($c, $t);"
    })

  override protected def withNewChildInternal(newChild: Expression): QueryTf =
    copy(child = newChild)
}

/** Native Catalyst form of the four-language function-word counter
  * [[Text.langHitsRow]] — t02's kernel (one tokenization, one pass,
  * four counters; replaces four interpreted HOF `filter` lambdas).
  */
case class LangHits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_langhits expects a string input, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("h_en", IntegerType, nullable = false),
    StructField("h_es", IntegerType, nullable = false),
    StructField("h_de", IntegerType, nullable = false),
    StructField("h_fr", IntegerType, nullable = false)))

  override def prettyName: String = "graft_langhits"

  override def nullSafeEval(input: Any): Any =
    Text.langHitsRow(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Text.langHitsRow($c);")

  override protected def withNewChildInternal(newChild: Expression): LangHits =
    copy(child = newChild)
}

/** Native Catalyst form of the t03 quality score
  * [[Text.qualityScore]] — same IEEE double op sequence as the kernel
  * and the oracle SQL.
  */
case class QualityScore(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_quality expects a string input, got ${child.dataType}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_quality"

  override def nullSafeEval(input: Any): Any =
    Text.qualityScoreStr(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Text.qualityScoreStr($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): QualityScore =
    copy(child = newChild)
}

/** Native Catalyst form of the 32-bit SimHash [[Text.simhash32]]:
  * bit b of the signature is set iff more fingerprints have bit b set
  * than not. Null input → null; empty array → 0L (no majority bits) —
  * the UDF's behavior. Kernel contract shared with [[Text.simhashOf]]
  * and `OracleDialect.simhash32`.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash expects array<bigint>, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    Text.simhashOf(input.asInstanceOf[ArrayData].toLongArray())

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val j = ctx.freshName("j")
      val fp = ctx.freshName("fp")
      val b = ctx.freshName("b")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $c.numElements();
         |final int[] $counts = new int[32];
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $fp = $c.getLong($j);
         |  for (int $b = 0; $b < 32; $b++) {
         |    if ((($fp >> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 32; $b++) {
         |  if ($counts[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}
