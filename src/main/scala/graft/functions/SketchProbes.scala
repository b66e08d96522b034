package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Codegen probes over DRIVER-BUILT sketches (r12).
  *
  * These replace the last Scala UDFs in gated hot paths — the bloom
  * prefilter probe (queries/Curation.scala c01/c03/x03) and the CMS
  * estimate (queries/TextAnalysis.scala x04). The repo's old doctrine
  * held that a driver-built sketch object forces a UDF; the
  * [[NearestCentroid]] kernel disproved that — `ctx.addReferenceObj`
  * embeds exactly such an object into generated code, the same
  * task-binary broadcast every Spark literal rides (Spark's own
  * runtime-filter bloom probe, `BloomFilterMightContain`, is the
  * in-tree precedent). The win over the UDF is staying inside
  * whole-stage codegen on the corpus-sized side: no Seq[Long] boxing
  * per row, no codegen fence around the probe.
  *
  * Both are null-safe (null input → null, like the builtin
  * expressions); a null ELEMENT inside a fingerprint array raises —
  * silently skipping it would undercount hits (the Quantize doctrine).
  */
case class BloomHits(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_hits expects array<bigint>, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_bloom_hits"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var n = 0L
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        "graft_bloom_hits: null fingerprint element")
      if (bf.mightContainLong(a.getLong(i))) n += 1
      i += 1
    }
    n
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bfRef = ctx.addReferenceObj("bf", bf, classOf[BloomFilter].getName)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long $n = 0L;
         |for (int $i = 0; $i < $v.numElements(); $i++) {
         |  if ($v.isNullAt($i)) throw new IllegalArgumentException(
         |    "graft_bloom_hits: null fingerprint element");
         |  if ($bfRef.mightContainLong($v.getLong($i))) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BloomHits =
    copy(child = newChild)
}

/** Count-Min estimate of a string item against a driver-built sketch —
  * same `estimateCount(String)` the x04 UDF called (UTF-8 bytes
  * hashing), now inside codegen. See [[BloomHits]] for the pattern.
  */
case class CmsEstimate(child: Expression, cms: CountMinSketch)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_estimate expects string, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_cms_estimate"

  override def nullSafeEval(v: Any): Any =
    cms.estimateCount(v.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cmsRef = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
      s"${ev.value} = $cmsRef.estimateCount($v.toString());"
    })

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

object SketchProbes {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** Number of `fps` elements the bloom filter might contain. */
  def bloomHits(fps: Column, bf: BloomFilter): Column =
    column(BloomHits(expression(fps), bf))

  /** CMS frequency estimate of a string item. */
  def cmsEstimate(item: Column, cms: CountMinSketch): Column =
    column(CmsEstimate(expression(item), cms))
}
