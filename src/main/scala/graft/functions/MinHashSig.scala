package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst form of the k-permutation MinHash signature
  * [[Text.minhashSig]]: sig[i] = min over fps of (fp·(37+101i) +
  * 17+1009i) mod 2^31−1 — the map-side kernel of every LSH query
  * (d03/d04/d06/d07, p01, DocPipeline), promoted from a Scala UDF to a
  * codegen'd expression: no catalyst↔Scala row/seq conversion per row,
  * primitive-array output, and the double loop inlines into the
  * enclosing WholeStageCodegen stage.
  *
  * Semantics contract shared with [[Text.minhashOf]] and the DuckDB
  * snippet in `queries/OracleDialect.minhashSig` — change all three
  * together or none. Null/empty input → null signature (the UDF's
  * behavior; empty sets have no minimum).
  */
case class MinHashSig(child: Expression, k: Int = 16) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else UnsafeArrayData.fromPrimitiveArray(Text.minhashOf(arr.toLongArray(), k))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      s"""
         |final int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $out = new long[$k];
         |  for (int $i = 0; $i < $k; $i++) {
         |    final long $a = 37L + 101L * $i;
         |    final long $b = 17L + 1009L * $i;
         |    long $m = Long.MAX_VALUE;
         |    for (int $j = 0; $j < $n; $j++) {
         |      final long $h = ($c.getLong($j) * $a + $b) % 2147483647L;
         |      if ($h < $m) $m = $h;
         |    }
         |    $out[$i] = $m;
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
