package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Product quantization (Jégou/Douze/Schmid, "Product quantization for
  * nearest neighbor search", TPAMI 2011 — public literature): split a
  * unit-normalized vector into `m` subvectors and encode each by its
  * L2-nearest codeword from a per-subspace codebook of `k` entries, so
  * a 64-dim double vector (512 B) compresses to m = 8 codes (8 B
  * unpacked, ~1 B each in parquet after dictionary+RLE) — the
  * compression tier PAST int8 (v09's 64 B) for corpora whose code
  * relation must live in memory at 100 TB. Scoring is ADC (asymmetric
  * distance computation): with unit vectors, cos(q, x) = dot(q̂, x̂) ≈
  * Σ_j dot(q̂_j, cb[j][code_j]) — and the per-query sub-dots are
  * precomputed once into an m×k lookup table, so each candidate costs
  * m table adds instead of dim multiply-adds (8 vs 64 here; 8 vs 1536
  * at production dims — the ratio IS the point).
  *
  * Training and encoding are fully deterministic (sequential
  * ascending-order folds, strictly-less wins keep the smallest code),
  * so the downstream recall contract is reproducible cross-run — the
  * same property that lets v10b gate the two-level router.
  */
object PqCodebook {

  /** Deterministic per-subspace Lloyd: seeds = the first `k` sample
    * subvectors, 4 iterations, L2 objective, assignment ties to the
    * smaller code, an emptied cell keeps its previous codeword. Input
    * vectors must be unit-normalized; returns the flat row-major
    * codebook double[m · k · subdim].
    */
  def train(sampleUnit: Seq[Array[Double]], m: Int, k: Int,
      iters: Int = 4): Array[Double] = {
    require(sampleUnit.size >= k, s"pq train: need >= $k samples, got ${sampleUnit.size}")
    val dim = sampleUnit.head.length
    require(dim % m == 0, s"pq train: dim $dim not divisible by m=$m")
    val sub = dim / m
    val cb = new Array[Double](m * k * sub)
    for (j <- 0 until m) {
      // seed: first k subvectors of this subspace
      var cents = Array.tabulate(k) { c =>
        java.util.Arrays.copyOfRange(sampleUnit(c), j * sub, (j + 1) * sub)
      }
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](sub))
        val cnts = new Array[Int](k)
        for (v <- sampleUnit) {
          var bestC = 0
          var best = Double.PositiveInfinity
          var c = 0
          while (c < k) {
            var d2 = 0.0
            var i = 0
            while (i < sub) {
              val d = v(j * sub + i) - cents(c)(i)
              d2 += d * d
              i += 1
            }
            if (java.lang.Double.compare(d2, best) < 0) { best = d2; bestC = c }
            c += 1
          }
          var i = 0
          while (i < sub) { sums(bestC)(i) += v(j * sub + i); i += 1 }
          cnts(bestC) += 1
        }
        cents = Array.tabulate(k) { c =>
          if (cnts(c) == 0) cents(c)
          else Array.tabulate(sub)(i => sums(c)(i) / cnts(c))
        }
      }
      for (c <- 0 until k; i <- 0 until sub)
        cb(j * k * sub + c * sub + i) = cents(c)(i)
    }
    cb
  }

  /** Per-query ADC lookup tables over unit query vectors: flat
    * double[nQ · m · k], lut(q, j, c) = dot(q̂_j, cb[j][c]) as the same
    * sequential left fold every other kernel uses.
    */
  def luts(cb: Array[Double], queriesUnit: Seq[Array[Double]],
      m: Int, k: Int): Array[Double] = {
    require(m > 0 && k > 0 && cb.length % (m * k) == 0,
      s"pq luts: codebook shape mismatch (${cb.length} values, m=$m, k=$k)")
    require(queriesUnit.nonEmpty,
      "pq luts: no query vectors (an empty query predicate should " +
        "short-circuit in the serving path, not reach LUT construction)")
    val dim = queriesUnit.head.length
    require(dim == m * (cb.length / (m * k)),
      s"pq luts: query dim $dim != m*sub = ${m * (cb.length / (m * k))}")
    val sub = dim / m
    val out = new Array[Double](queriesUnit.size * m * k)
    for ((q, qi) <- queriesUnit.zipWithIndex; j <- 0 until m; c <- 0 until k) {
      var acc = 0.0
      var i = 0
      while (i < sub) {
        acc += q(j * sub + i) * cb(j * k * sub + c * sub + i)
        i += 1
      }
      out(qi * m * k + j * k + c) = acc
    }
    out
  }
}

/** PQ encoding of `v / nrm` against an embedded codebook — array<long>
  * of `m` codes in 0..k−1, each the L2-argmin codeword of its
  * subvector (ties to the smaller code via the same total-order
  * strictly-less the other kernels use). Codebook rides as a codegen
  * reference object (the NearestCentroid pattern). Null elements and
  * non-positive norms RAISE (the QuantizeUnitI8 doctrine: corrupt
  * embeddings must fail loudly, not score plausibly).
  */
case class PqEncode(left: Expression, right: Expression,
    cb: Array[Double], m: Int, k: Int) extends BinaryExpression {

  require(m > 0 && k > 0 && cb.length % (m * k) == 0,
    s"graft_pq_encode: codebook shape mismatch (${cb.length} values, m=$m, k=$k)")
  private val sub = cb.length / (m * k)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects (array<double>, double), got $l / $r")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(v: Any, nrm: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = nrm.asInstanceOf[Double]
    if (x.numElements() != m * sub) throw new IllegalArgumentException(
      s"graft_pq_encode: vector dim ${x.numElements()} != ${m * sub}")
    if (!(n > 0.0)) throw new IllegalArgumentException(
      s"graft_pq_encode: norm must be positive, got $n")
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var bestC = 0L
      var best = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        var d2 = 0.0
        var i = 0
        while (i < sub) {
          if (x.isNullAt(j * sub + i)) throw new IllegalArgumentException(
            s"graft_pq_encode: null element at position ${j * sub + i}")
          val d = x.getDouble(j * sub + i) / n - cb(j * k * sub + c * sub + i)
          d2 += d * d
          i += 1
        }
        if (java.lang.Double.compare(d2, best) < 0) { best = d2; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val cbRef = ctx.addReferenceObj("pqcb", cb, "double[]")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val d2 = ctx.freshName("d2")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val out = ctx.freshName("out")
      s"""
         |if ($v.numElements() != ${m * sub}) throw new IllegalArgumentException(
         |  "graft_pq_encode: vector dim " + $v.numElements() + " != ${m * sub}");
         |if (!($nrm > 0.0)) throw new IllegalArgumentException(
         |  "graft_pq_encode: norm must be positive, got " + $nrm);
         |long[] $out = new long[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  long $bestC = 0L;
         |  double $best = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d2 = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      if ($v.isNullAt($j * $sub + $i)) throw new IllegalArgumentException(
         |        "graft_pq_encode: null element at position " + ($j * $sub + $i));
         |      double $d = $v.getDouble($j * $sub + $i) / $nrm
         |        - $cbRef[$j * $k * $sub + $c * $sub + $i];
         |      $d2 += $d * $d;
         |    }
         |    if (java.lang.Double.compare($d2, $best) < 0) { $best = $d2; $bestC = $c; }
         |  }
         |  $out[$j] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** ADC score from an embedded per-query LUT: Σ_j lut(qIdx, j, code_j),
  * ascending-j left fold — `m` adds per candidate, the asymmetric-
  * distance hot loop. `qIdx` is the dense 0..nQ−1 index of the query
  * (carried on the broadcast query side); out-of-range indices and
  * wrong code lengths RAISE.
  */
case class PqAdcDot(left: Expression, right: Expression,
    luts: Array[Double], m: Int, k: Int) extends BinaryExpression {

  require(m > 0 && k > 0 && luts.length % (m * k) == 0,
    s"graft_pq_adc: lut shape mismatch (${luts.length} values, m=$m, k=$k)")
  private val nQ = luts.length / (m * k)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (IntegerType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc expects (int, array<bigint>), got $l / $r")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(qi: Any, codes: Any): Any = {
    val q = qi.asInstanceOf[Int]
    val cs = codes.asInstanceOf[ArrayData]
    if (q < 0 || q >= nQ) throw new IllegalArgumentException(
      s"graft_pq_adc: query index $q out of range [0, $nQ)")
    if (cs.numElements() != m) throw new IllegalArgumentException(
      s"graft_pq_adc: code length ${cs.numElements()} != m=$m")
    var acc = 0.0
    var j = 0
    while (j < m) {
      val c = cs.getLong(j)
      if (c < 0 || c >= k) throw new IllegalArgumentException(
        s"graft_pq_adc: code $c out of range [0, $k)")
      acc += luts(q * m * k + j * k + c.toInt)
      j += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (qi, codes) => {
      val lutRef = ctx.addReferenceObj("pqlut", luts, "double[]")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
         |if ($qi < 0 || $qi >= $nQ) throw new IllegalArgumentException(
         |  "graft_pq_adc: query index " + $qi + " out of range [0, $nQ)");
         |if ($codes.numElements() != $m) throw new IllegalArgumentException(
         |  "graft_pq_adc: code length " + $codes.numElements() + " != m=$m");
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  long $c = $codes.getLong($j);
         |  if ($c < 0 || $c >= $k) throw new IllegalArgumentException(
         |    "graft_pq_adc: code " + $c + " out of range [0, $k)");
         |  $acc += $lutRef[$qi * $m * $k + $j * $k + (int) $c];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
}

/** PQ encoding of the RESIDUAL `v / nrm − cents[cIdx]` against an
  * embedded residual codebook — the IVFADC form (Jégou/Douze/Schmid,
  * TPAMI 2011 §IV): residuals against the coarse centroid concentrate
  * near zero, so the same m×k codebook spends its resolution where the
  * data actually is and recall rises at equal bytes. `cIdx` is the
  * DENSE 0..nC−1 index of the vector's coarse centroid (carried via a
  * broadcast c_id→c_idx map on the assignment relation); `cents` is
  * the flat row-major array of UNIT coarse centroids. Same total-order
  * strictly-less argmin, codegen, and loud-failure contract as
  * [[PqEncode]]. Scoring needs no new kernel: with residual LUTs,
  * dot(q̂, x̂) = dot(q̂, ĉ) + dot(q̂, r) — the per-(query, probed-list)
  * offset dot(q̂, ĉ) rides the probe relation as a plain column and
  * [[PqAdcDot]] supplies the residual half.
  */
case class PqEncodeResidual(first: Expression, second: Expression,
    third: Expression, cb: Array[Double], cents: Array[Double],
    m: Int, k: Int) extends TernaryExpression {

  require(m > 0 && k > 0 && cb.length % (m * k) == 0,
    s"graft_pq_encode_residual: codebook shape mismatch (${cb.length} values, m=$m, k=$k)")
  private val sub = cb.length / (m * k)
  private val dim = m * sub
  require(cents.nonEmpty && cents.length % dim == 0,
    s"graft_pq_encode_residual: centroid array length ${cents.length} not a multiple of dim $dim")
  private val nC = cents.length / dim

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode_residual expects (array<double>, double, int), got $a / $b / $c")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_pq_encode_residual"

  override def nullSafeEval(v: Any, nrm: Any, cIdx: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = nrm.asInstanceOf[Double]
    val ci = cIdx.asInstanceOf[Int]
    if (x.numElements() != dim) throw new IllegalArgumentException(
      s"graft_pq_encode_residual: vector dim ${x.numElements()} != $dim")
    if (!(n > 0.0)) throw new IllegalArgumentException(
      s"graft_pq_encode_residual: norm must be positive, got $n")
    if (ci < 0 || ci >= nC) throw new IllegalArgumentException(
      s"graft_pq_encode_residual: centroid index $ci out of range [0, $nC)")
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var bestC = 0L
      var best = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        var d2 = 0.0
        var i = 0
        while (i < sub) {
          val p = j * sub + i
          if (x.isNullAt(p)) throw new IllegalArgumentException(
            s"graft_pq_encode_residual: null element at position $p")
          val d = (x.getDouble(p) / n - cents(ci * dim + p)) -
            cb(j * k * sub + c * sub + i)
          d2 += d * d
          i += 1
        }
        if (java.lang.Double.compare(d2, best) < 0) { best = d2; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nrm, cIdx) => {
      val cbRef = ctx.addReferenceObj("pqrcb", cb, "double[]")
      val ctRef = ctx.addReferenceObj("pqrcents", cents, "double[]")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val d2 = ctx.freshName("d2")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val out = ctx.freshName("out")
      s"""
         |if ($v.numElements() != $dim) throw new IllegalArgumentException(
         |  "graft_pq_encode_residual: vector dim " + $v.numElements() + " != $dim");
         |if (!($nrm > 0.0)) throw new IllegalArgumentException(
         |  "graft_pq_encode_residual: norm must be positive, got " + $nrm);
         |if ($cIdx < 0 || $cIdx >= $nC) throw new IllegalArgumentException(
         |  "graft_pq_encode_residual: centroid index " + $cIdx + " out of range [0, $nC)");
         |long[] $out = new long[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  long $bestC = 0L;
         |  double $best = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d2 = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      int $p = $j * $sub + $i;
         |      if ($v.isNullAt($p)) throw new IllegalArgumentException(
         |        "graft_pq_encode_residual: null element at position " + $p);
         |      double $d = ($v.getDouble($p) / $nrm - $ctRef[$cIdx * $dim + $p])
         |        - $cbRef[$j * $k * $sub + $c * $sub + $i];
         |      $d2 += $d * $d;
         |    }
         |    if (java.lang.Double.compare($d2, $best) < 0) { $best = $d2; $bestC = $c; }
         |  }
         |  $out[$j] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqEncodeResidual =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Per-query ADC lookup table computed EXECUTOR-SIDE — the distributed
  * twin of [[PqCodebook.luts]] (r15, verdict ask #3): emits the flat
  * m·k array lut[j·k+c] = dot(q̂_j, cb[j][c]) for ONE query row, so the
  * query side of PQ serving becomes a relation (broadcast the skinny
  * (q_id, lut) rows) instead of a driver-materialized array — batch
  * serving scales past driver memory. IEEE-identical to the driver
  * path: the same per-element `v[i]/nrm` unit division and the same
  * ascending-i left fold, so [[PqAdcFromLut]] over this column
  * reproduces [[PqAdcDot]] over driver LUTs bit-for-bit
  * (PqDistServeSpec pins row equality). Runs once per QUERY row —
  * m·k·sub multiply-adds, the LUT cost every ADC system pays per
  * query, now paid where the queries live.
  */
case class PqLuts(left: Expression, right: Expression,
    cb: Array[Double], m: Int, k: Int) extends BinaryExpression {

  require(m > 0 && k > 0 && cb.length % (m * k) == 0,
    s"graft_pq_luts: codebook shape mismatch (${cb.length} values, m=$m, k=$k)")
  private val sub = cb.length / (m * k)
  private val dim = m * sub

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_luts expects (array<double>, double), got $l / $r")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_pq_luts"

  override def nullSafeEval(v: Any, nrm: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = nrm.asInstanceOf[Double]
    if (x.numElements() != dim) throw new IllegalArgumentException(
      s"graft_pq_luts: vector dim ${x.numElements()} != $dim")
    if (!(n > 0.0)) throw new IllegalArgumentException(
      s"graft_pq_luts: norm must be positive, got $n")
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var acc = 0.0
        var i = 0
        while (i < sub) {
          val p = j * sub + i
          if (x.isNullAt(p)) throw new IllegalArgumentException(
            s"graft_pq_luts: null element at position $p")
          acc += (x.getDouble(p) / n) * cb(j * k * sub + c * sub + i)
          i += 1
        }
        out(j * k + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val cbRef = ctx.addReferenceObj("pqlcb", cb, "double[]")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |if ($v.numElements() != $dim) throw new IllegalArgumentException(
         |  "graft_pq_luts: vector dim " + $v.numElements() + " != $dim");
         |if (!($nrm > 0.0)) throw new IllegalArgumentException(
         |  "graft_pq_luts: norm must be positive, got " + $nrm);
         |double[] $out = new double[${m * k}];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      int $p = $j * $sub + $i;
         |      if ($v.isNullAt($p)) throw new IllegalArgumentException(
         |        "graft_pq_luts: null element at position " + $p);
         |      $acc += ($v.getDouble($p) / $nrm)
         |        * $cbRef[$j * $k * $sub + $c * $sub + $i];
         |    }
         |    $out[$j * $k + $c] = $acc;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqLuts =
    copy(left = newLeft, right = newRight)
}

/** IVF probe routing computed EXECUTOR-SIDE — the distributed twin of
  * the driver-side probe loop in `ivfAdcServeCore` (r15, verdict ask
  * #3): for ONE query row, rank the embedded coarse centroids by
  * (cos DESC, c_id ASC) and emit the top-`nprobe` as
  * struct(cids: array<long>, bases: array<double>), where base =
  * dot(q̂, ĉ) — the per-(query, list) offset IVFADC's residual
  * decomposition adds to the LUT half. IEEE-identical to the driver
  * path: same per-element unit division, same ascending-i fold over
  * each centroid in ascending-c_id order, same total-order
  * strictly-greater selection — so the probed lists AND base values
  * match the driver's bit-for-bit. Runs once per query row
  * (nlist·dim multiply-adds).
  */
case class PqProbes(left: Expression, right: Expression,
    cids: Array[Long], cents: Array[Double], nprobe: Int)
    extends BinaryExpression {

  require(cids.nonEmpty, "graft_pq_probes: empty coarse book")
  require(cents.length % cids.length == 0,
    s"graft_pq_probes: centroid array length ${cents.length} not a multiple of nlist ${cids.length}")
  private val nlist = cids.length
  private val dim = cents.length / nlist
  require(nprobe > 0 && nprobe <= nlist,
    s"graft_pq_probes: nprobe $nprobe out of range [1, $nlist]")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_probes expects (array<double>, double), got $l / $r")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cids", ArrayType(LongType, containsNull = false)),
    StructField("bases", ArrayType(DoubleType, containsNull = false))))

  override def prettyName: String = "graft_pq_probes"

  /** Shared probe core (eval + the spec's reference): cos per
    * centroid, then `nprobe` strictly-greater selection passes.
    */
  private def probe(x: ArrayData, n: Double): (Array[Long], Array[Double]) = {
    val cos = new Array[Double](nlist)
    var ci = 0
    while (ci < nlist) {
      var acc = 0.0
      var i = 0
      while (i < dim) {
        if (x.isNullAt(i)) throw new IllegalArgumentException(
          s"graft_pq_probes: null element at position $i")
        acc += (x.getDouble(i) / n) * cents(ci * dim + i)
        i += 1
      }
      cos(ci) = acc
      ci += 1
    }
    val taken = new Array[Boolean](nlist)
    val outC = new Array[Long](nprobe)
    val outB = new Array[Double](nprobe)
    var r = 0
    while (r < nprobe) {
      var best = -1
      var ci2 = 0
      while (ci2 < nlist) {
        if (!taken(ci2) &&
            (best < 0 || java.lang.Double.compare(cos(ci2), cos(best)) > 0))
          best = ci2
        ci2 += 1
      }
      taken(best) = true
      outC(r) = cids(best)
      outB(r) = cos(best)
      r += 1
    }
    (outC, outB)
  }

  override def nullSafeEval(v: Any, nrm: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = nrm.asInstanceOf[Double]
    if (x.numElements() != dim) throw new IllegalArgumentException(
      s"graft_pq_probes: vector dim ${x.numElements()} != $dim")
    if (!(n > 0.0)) throw new IllegalArgumentException(
      s"graft_pq_probes: norm must be positive, got $n")
    val (outC, outB) = probe(x, n)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(outC), new GenericArrayData(outB)))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      // per-QUERY-row routing (n_q evaluations, never the code scan):
      // delegate to the compiled probe core instead of inlining the
      // selection loops — same codegen-called-static pattern as the
      // text scorers, keeps the surrounding projection in whole-stage
      // codegen
      val self = ctx.addReferenceObj("pqprobes", this,
        classOf[PqProbes].getName)
      s"""
         |if ($v.numElements() != $dim) throw new IllegalArgumentException(
         |  "graft_pq_probes: vector dim " + $v.numElements() + " != $dim");
         |if (!($nrm > 0.0)) throw new IllegalArgumentException(
         |  "graft_pq_probes: norm must be positive, got " + $nrm);
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  $self.evalProbe($v, $nrm);
       """.stripMargin
    })

  /** Codegen entry point — public so generated classes can call it. */
  def evalProbe(v: ArrayData, nrm: Double): Any = {
    val (outC, outB) = probe(v, nrm)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(outC), new GenericArrayData(outB)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqProbes =
    copy(left = newLeft, right = newRight)
}

/** ADC score from a COLUMN-carried LUT — the distributed twin of
  * [[PqAdcDot]] (r15, verdict ask #3): Σ_j lut[j·k + code_j] where the
  * per-query LUT arrives as an array column (computed by [[PqLuts]] on
  * the query side, broadcast, and hash-joined to the candidates on
  * q_id) instead of an embedded driver array. Same ascending-j left
  * fold, same loud out-of-range failures; `m` adds per candidate — the
  * ADC hot loop, fully codegen'd.
  */
case class PqAdcFromLut(left: Expression, right: Expression,
    m: Int, k: Int) extends BinaryExpression {

  require(m > 0 && k > 0, s"graft_pq_adc_lut: bad shape m=$m k=$k")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc_lut expects (array<double>, array<bigint>), got $l / $r")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_adc_lut"

  override def nullSafeEval(lut: Any, codes: Any): Any = {
    val l = lut.asInstanceOf[ArrayData]
    val cs = codes.asInstanceOf[ArrayData]
    if (l.numElements() != m * k) throw new IllegalArgumentException(
      s"graft_pq_adc_lut: lut length ${l.numElements()} != m*k = ${m * k}")
    if (cs.numElements() != m) throw new IllegalArgumentException(
      s"graft_pq_adc_lut: code length ${cs.numElements()} != m=$m")
    var acc = 0.0
    var j = 0
    while (j < m) {
      val c = cs.getLong(j)
      if (c < 0 || c >= k) throw new IllegalArgumentException(
        s"graft_pq_adc_lut: code $c out of range [0, $k)")
      acc += l.getDouble(j * k + c.toInt)
      j += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
         |if ($lut.numElements() != ${m * k}) throw new IllegalArgumentException(
         |  "graft_pq_adc_lut: lut length " + $lut.numElements() + " != m*k = ${m * k}");
         |if ($codes.numElements() != $m) throw new IllegalArgumentException(
         |  "graft_pq_adc_lut: code length " + $codes.numElements() + " != m=$m");
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  long $c = $codes.getLong($j);
         |  if ($c < 0 || $c >= $k) throw new IllegalArgumentException(
         |    "graft_pq_adc_lut: code " + $c + " out of range [0, $k)");
         |  $acc += $lut.getDouble($j * $k + (int) $c);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcFromLut =
    copy(left = newLeft, right = newRight)
}
