package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Int8 scalar quantization of a unit-normalized vector — the memory
  * side of the 100 TB ANN story: a 64-dim float32 embedding is 256 B,
  * its int8 codes are 64 B, so a quantized scan touches 4× less I/O
  * and the code relation for a corpus that cannot fit in memory as
  * floats often can as codes (v09 re-ranks the tiny surviving
  * candidate set against the float vectors fetched by id).
  *
  * code_i = floor(v_i / nrm · 127 + 0.5) — round-half-up of the
  * normalized component scaled to [−127, 127]. Every step (divide,
  * multiply, add, floor) is one IEEE-754 double operation mirrored
  * literally by the DuckDB oracle (`OracleDialect.i8Codes`), so the
  * codes — and hence every downstream integer score — are bit-exact
  * cross-engine. Precondition: nrm > 0 (a zero vector has no
  * direction; the fixtures contain none and v09's query set filters
  * on vec_id ranges of real vectors).
  *
  * Codes are carried as `array<bigint>` rather than a packed binary:
  * parquet dictionary+RLE encodes the small-int values to ~1 B each
  * on disk, and the unpacked form keeps [[LongDot]] a straight-line
  * codegen loop with no bit-twiddling in the hot path.
  *
  * Malformed inputs fail LOUDLY (ADVICE r10): a null element or a
  * non-positive norm would otherwise quantize as silent garbage while
  * the declared output claims containsNull=false — both now raise,
  * because a corrupt embedding that scores plausibly is strictly worse
  * than a failed task. The input type still ADMITS containsNull=true
  * (parquet list columns carry that flag schema-wide even when no
  * element is null, so rejecting it in checkInputDataTypes would
  * reject every real corpus); the guarantee moves to runtime where the
  * actual nulls are.
  */
case class QuantizeUnitI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_quantize_i8 expects (array<double>, double), got $l / $r")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_quantize_i8"

  override def nullSafeEval(v: Any, nrm: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val d = nrm.asInstanceOf[Double]
    if (!(d > 0.0)) throw new IllegalArgumentException(
      s"graft_quantize_i8: norm must be positive, got $d (zero vector has no direction)")
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) throw new IllegalArgumentException(
        s"graft_quantize_i8: null element at position $i")
      out(i) = math.floor(x.getDouble(i) / d * 127.0 + 0.5).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |if (!($nrm > 0.0)) throw new IllegalArgumentException(
         |  "graft_quantize_i8: norm must be positive, got " + $nrm);
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) throw new IllegalArgumentException(
         |    "graft_quantize_i8: null element at position " + $i);
         |  $out[$i] = (long) java.lang.Math.floor($v.getDouble($i) / $nrm * 127.0 + 0.5);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizeUnitI8 =
    copy(left = newLeft, right = newRight)
}

/** Native integer dot product over two `array<bigint>` code columns —
  * v09's phase-1 scoring kernel (the analogue of [[DotProduct]] for
  * quantized codes). Pure 64-bit integer multiply-accumulate: exact,
  * associative, overflow-free for int8 codes at any realistic dim
  * (|code| ≤ 127 ⇒ |term| ≤ 16 129; 2⁶³ headroom), and bit-identical
  * to the oracle's `list_reduce` integer fold by construction.
  * Whole-stage-codegen'd so the n_query × n_corpus candidate scan —
  * the hot loop of quantized retrieval — stays a primitive JIT loop.
  *
  * Mismatched code lengths RAISE (ADVICE r10): the previous
  * min-length truncation produced a plausible-looking score on this
  * engine where the DuckDB oracle (which indexes by len(a)) yields
  * NULL — cross-engine divergence on exactly the malformed rows a
  * gate exists to catch. Every legitimate caller compares codes of
  * one quantizer, so unequal dims are corruption, not data.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_long_dot expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_long_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) throw new IllegalArgumentException(
      s"graft_long_dot: code length mismatch ($n vs ${y.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) throw new IllegalArgumentException(
         |  "graft_long_dot: code length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}
