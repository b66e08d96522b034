package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine-nearest-centroid argmax against an embedded codebook — the
  * IVF assignment kernel (queries/Similarity.scala `ivfAssign`).
  *
  * WHY an expression and not a join: the declarative argmax
  * (crossJoin(broadcast(centroids)) + row_number window) materializes
  * n·nlist rows each carrying the full vector through a per-vec_id
  * sort. At the production dial nlist ≈ √n that is n^1.5 rows — at the
  * 100× replica (n=500k, nlist=708) 354M half-KB rows through a
  * window, measured 172 s; this kernel does the same argmax as one
  * scan-side loop over the codebook, zero extra rows, zero shuffle:
  * the n·nlist·dim multiply-adds remain (22 GFLOP there — seconds
  * across 32 threads) but nothing is materialized. The codebook rides
  * along as a codegen reference object (flattened row-major
  * double[]), the same task-binary broadcast every Spark literal
  * uses: at nlist=1e5 (n=10¹⁰) it is a 51 MB codebook — standard IVF
  * practice; beyond that a two-level IVF shards the codebook, out of
  * scope here.
  *
  * Semantics are EXACTLY the window formulation the oracle mirrors
  * (`ORDER BY cos DESC, c_id`): centroids are iterated in ascending
  * c_id and a candidate wins only on STRICTLY greater cosine, so ties
  * keep the smallest c_id; each cosine is the same left-fold dot /
  * (nrm·cn) IEEE sequence as [[DotProduct]]/cosPre. "Greater" is the
  * `java.lang.Double.compare` TOTAL order with −0.0 collapsed to 0.0
  * first (r12, ADVICE r11): a zero-norm vector or centroid yields NaN
  * cosines, and both engines' `ORDER BY cos DESC` sorts NaN above
  * every double — a naive `>` would never select NaN and return a
  * stale default instead; the collapse keeps ±0.0 ties on c_id like
  * SQL sort equality does. Hash-gated cross-engine through
  * v02/v07/v08/v08b.
  *
  * Output: struct<c_id: bigint, c_cos: double> (the assignment and
  * its objective value — ivfTrain's ascent measure rides the same
  * pass).
  */
case class NearestCentroid(left: Expression, right: Expression,
    cids: Array[Long], flat: Array[Double], cns: Array[Double], dim: Int)
    extends BinaryExpression {

  require(cids.nonEmpty, "graft_nearest_centroid: empty codebook")
  require(flat.length == cids.length * dim && cns.length == cids.length,
    s"graft_nearest_centroid: codebook shape mismatch " +
      s"(${cids.length} ids, ${flat.length} values, ${cns.length} norms, dim $dim)")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects (array<double>, double), got $l / $r")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("c_id", LongType, nullable = false),
    StructField("c_cos", DoubleType, nullable = false)))

  override def prettyName: String = "graft_nearest_centroid"

  override def nullSafeEval(v: Any, nrm: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim) throw new IllegalArgumentException(
      s"graft_nearest_centroid: vector dim ${x.numElements()} != codebook dim $dim")
    val n = nrm.asInstanceOf[Double]
    var bestId = cids(0)
    var best = Double.NegativeInfinity
    var c = 0
    while (c < cids.length) {
      var acc = 0.0
      val off = c * dim
      var i = 0
      while (i < dim) { acc += x.getDouble(i) * flat(off + i); i += 1 }
      var cos = acc / (n * cns(c))
      if (cos == 0.0) cos = 0.0
      if (java.lang.Double.compare(cos, best) > 0) { best = cos; bestId = cids(c) }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestId, best)): InternalRow
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val idsRef = ctx.addReferenceObj("cids", cids, "long[]")
      val flatRef = ctx.addReferenceObj("flat", flat, "double[]")
      val cnsRef = ctx.addReferenceObj("cns", cns, "double[]")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val cos = ctx.freshName("cos")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      s"""
         |if ($v.numElements() != $dim) throw new IllegalArgumentException(
         |  "graft_nearest_centroid: vector dim " + $v.numElements() + " != codebook dim $dim");
         |long $bestId = $idsRef[0];
         |double $best = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < ${cids.length}; $c++) {
         |  double $acc = 0.0;
         |  int $off = $c * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $acc += $v.getDouble($i) * $flatRef[$off + $i];
         |  }
         |  double $cos = $acc / ($nrm * $cnsRef[$c]);
         |  if ($cos == 0.0d) $cos = 0.0d;
         |  if (java.lang.Double.compare($cos, $best) > 0) { $best = $cos; $bestId = $idsRef[$c]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$bestId, $best});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}
