package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst form of the portable polynomial hash [[Text.charFp]]
  * (`acc = (acc * 31 + codeunit) mod 2^31-1` over UTF-16 code units,
  * acc₀ = 0) — the scalar kernel behind document fingerprints (t04) and
  * content-addressed dataset splits (t10), promoted from a Scala UDF to
  * a codegen'd expression: no catalyst↔Scala row conversion, and the
  * loop inlines into the enclosing WholeStageCodegen stage.
  *
  * Interpreted and generated paths both delegate the semantics contract
  * to the same recurrence as [[Text.charFpStr]] and the DuckDB snippet
  * in `queries/OracleDialect.fp` — change all three together or none.
  */
case class CharFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_charfp expects a string input, got ${child.dataType}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_charfp"

  override def nullSafeEval(input: Any): Any =
    Text.charFpStr(input.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31L + $s.charAt($i)) % 2147483647L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharFp =
    copy(child = newChild)
}
