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

/** Top-`w` nearest centroids by (cos DESC, c_id ASC) against an
  * embedded codebook — the COARSE routing step of the two-level IVF
  * (SCALE.md r12): emits the `w` super-centroid ids to probe, in rank
  * order. Same IEEE cosine sequence and total-order compare as
  * [[NearestCentroid]] (−0.0 collapsed, NaN sorts first); iteration in
  * ascending c_id plus strictly-greater insertion keeps equal-cosine
  * ties on the smaller id, so w = codebook size enumerates the exact
  * argsort. Output: array<bigint> of min(w, nlist) ids.
  */
case class NearestCentroidsTopW(left: Expression, right: Expression,
    cids: Array[Long], flat: Array[Double], cns: Array[Double], dim: Int, w: Int)
    extends BinaryExpression {

  require(cids.nonEmpty, "graft_nearest_centroids_topw: empty codebook")
  require(w >= 1, "graft_nearest_centroids_topw: w must be >= 1")
  require(flat.length == cids.length * dim && cns.length == cids.length,
    s"graft_nearest_centroids_topw: codebook shape mismatch " +
      s"(${cids.length} ids, ${flat.length} values, ${cns.length} norms, dim $dim)")

  private val k = math.min(w, cids.length)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroids_topw expects (array<double>, double), got $l / $r")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_nearest_centroids_topw"

  override def nullSafeEval(v: Any, nrm: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim) throw new IllegalArgumentException(
      s"graft_nearest_centroids_topw: vector dim ${x.numElements()} != codebook dim $dim")
    val n = nrm.asInstanceOf[Double]
    val topCos = Array.fill(k)(Double.NegativeInfinity)
    val topId = new Array[Long](k)
    var filled = 0
    var c = 0
    while (c < cids.length) {
      var acc = 0.0
      val off = c * dim
      var i = 0
      while (i < dim) { acc += x.getDouble(i) * flat(off + i); i += 1 }
      var cos = acc / (n * cns(c))
      if (cos == 0.0) cos = 0.0
      // insertion position: AFTER every held entry with cos >= ours
      // under the total order (ascending-id iteration makes equal-cos
      // ties keep the earlier, smaller id)
      var pos = filled
      while (pos > 0 && java.lang.Double.compare(cos, topCos(pos - 1)) > 0) pos -= 1
      if (pos < k) {
        var j = math.min(filled, k - 1)
        while (j > pos) { topCos(j) = topCos(j - 1); topId(j) = topId(j - 1); j -= 1 }
        topCos(pos) = cos; topId(pos) = cids(c)
        if (filled < k) filled += 1
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(topId.take(filled))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val idsRef = ctx.addReferenceObj("cids", cids, "long[]")
      val flatRef = ctx.addReferenceObj("flat", flat, "double[]")
      val cnsRef = ctx.addReferenceObj("cns", cns, "double[]")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val off = ctx.freshName("off"); val acc = ctx.freshName("acc")
      val cos = ctx.freshName("cos"); val pos = ctx.freshName("pos")
      val j = ctx.freshName("j"); val filled = ctx.freshName("filled")
      val topCos = ctx.freshName("topCos"); val topId = ctx.freshName("topId")
      val out = ctx.freshName("out")
      s"""
         |if ($v.numElements() != $dim) throw new IllegalArgumentException(
         |  "graft_nearest_centroids_topw: vector dim " + $v.numElements() + " != codebook dim $dim");
         |double[] $topCos = new double[$k];
         |long[] $topId = new long[$k];
         |java.util.Arrays.fill($topCos, Double.NEGATIVE_INFINITY);
         |int $filled = 0;
         |for (int $c = 0; $c < ${cids.length}; $c++) {
         |  double $acc = 0.0;
         |  int $off = $c * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $acc += $v.getDouble($i) * $flatRef[$off + $i];
         |  }
         |  double $cos = $acc / ($nrm * $cnsRef[$c]);
         |  if ($cos == 0.0d) $cos = 0.0d;
         |  int $pos = $filled;
         |  while ($pos > 0 && java.lang.Double.compare($cos, $topCos[$pos - 1]) > 0) $pos--;
         |  if ($pos < $k) {
         |    for (int $j = java.lang.Math.min($filled, $k - 1); $j > $pos; $j--) {
         |      $topCos[$j] = $topCos[$j - 1]; $topId[$j] = $topId[$j - 1];
         |    }
         |    $topCos[$pos] = $cos; $topId[$pos] = $idsRef[$c];
         |    if ($filled < $k) $filled++;
         |  }
         |}
         |long[] $out = java.util.Arrays.copyOf($topId, $filled);
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidsTopW =
    copy(left = newLeft, right = newRight)
}

/** Shard-local cosine argmax where the codebook arrives in ROW COLUMNS
  * (`c_ids: array<bigint>`, row-major `flat: array<double>`,
  * `cns: array<double>`) instead of a codegen reference object — the
  * FINE step of the two-level IVF (SCALE.md r12): vectors join their
  * probed shard's row, and this expression runs the same argmax as
  * [[NearestCentroid]] over the joined shard codebook. Identical
  * cosine sequence and total-order tie-break; callers must sort each
  * shard's centroid list by c_id so strictly-greater wins keep the
  * smallest id. Output: struct<c_id: bigint, c_cos: double>.
  */
case class ShardNearest(v: Expression, nrm: Expression,
    scids: Expression, sflat: Expression, scns: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(v, nrm, scids, sflat, scns)
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    (v.dataType, nrm.dataType, scids.dataType, sflat.dataType, scns.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType,
            ArrayType(LongType, _), ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_shard_nearest expects (array<double>, double, array<bigint>, " +
          s"array<double>, array<double>), got $other")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("c_id", LongType, nullable = false),
    StructField("c_cos", DoubleType, nullable = false)))

  override def prettyName: String = "graft_shard_nearest"

  override def eval(input: InternalRow): Any = {
    val vv = v.eval(input); val nv = nrm.eval(input)
    val iv = scids.eval(input); val fv = sflat.eval(input); val cv = scns.eval(input)
    if (vv == null || nv == null || iv == null || fv == null || cv == null) return null
    val x = vv.asInstanceOf[ArrayData]
    val n = nv.asInstanceOf[Double]
    val ids = iv.asInstanceOf[ArrayData]
    val fl = fv.asInstanceOf[ArrayData]
    val cn = cv.asInstanceOf[ArrayData]
    val m = ids.numElements()
    val dim = x.numElements()
    if (m == 0 || fl.numElements() != m * dim || cn.numElements() != m)
      throw new IllegalArgumentException(
        s"graft_shard_nearest: shard shape mismatch ($m ids, ${fl.numElements()} " +
          s"values, ${cn.numElements()} norms, dim $dim)")
    var bestId = ids.getLong(0)
    var best = Double.NegativeInfinity
    var c = 0
    while (c < m) {
      var acc = 0.0
      val off = c * dim
      var i = 0
      while (i < dim) { acc += x.getDouble(i) * fl.getDouble(off + i); i += 1 }
      var cos = acc / (n * cn.getDouble(c))
      if (cos == 0.0) cos = 0.0
      if (java.lang.Double.compare(cos, best) > 0) { best = cos; bestId = ids.getLong(c) }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestId, best)): InternalRow
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val gs = children.map(_.genCode(ctx))
    val Seq(vG, nG, iG, fG, cG) = gs
    val m = ctx.freshName("m"); val dim = ctx.freshName("dim")
    val c = ctx.freshName("c"); val i = ctx.freshName("i")
    val off = ctx.freshName("off"); val acc = ctx.freshName("acc")
    val cos = ctx.freshName("cos"); val best = ctx.freshName("best")
    val bestId = ctx.freshName("bestId")
    ev.copy(code = code"""
      ${gs.map(_.code).reduce(_ + _)}
      boolean ${ev.isNull} = ${vG.isNull} || ${nG.isNull} || ${iG.isNull} ||
        ${fG.isNull} || ${cG.isNull};
      InternalRow ${ev.value} = null;
      if (!${ev.isNull}) {
        int ${m} = ${iG.value}.numElements();
        int ${dim} = ${vG.value}.numElements();
        if (${m} == 0 || ${fG.value}.numElements() != ${m} * ${dim} ||
            ${cG.value}.numElements() != ${m})
          throw new IllegalArgumentException("graft_shard_nearest: shard shape mismatch");
        long ${bestId} = ${iG.value}.getLong(0);
        double ${best} = Double.NEGATIVE_INFINITY;
        for (int ${c} = 0; ${c} < ${m}; ${c}++) {
          double ${acc} = 0.0;
          int ${off} = ${c} * ${dim};
          for (int ${i} = 0; ${i} < ${dim}; ${i}++) {
            ${acc} += ${vG.value}.getDouble(${i}) * ${fG.value}.getDouble(${off} + ${i});
          }
          double ${cos} = ${acc} / (${nG.value} * ${cG.value}.getDouble(${c}));
          if (${cos} == 0.0d) ${cos} = 0.0d;
          if (java.lang.Double.compare(${cos}, ${best}) > 0) {
            ${best} = ${cos}; ${bestId} = ${iG.value}.getLong(${c});
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[]{${bestId}, ${best}});
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShardNearest =
    copy(v = newChildren(0), nrm = newChildren(1), scids = newChildren(2),
      sflat = newChildren(3), scns = newChildren(4))
}
