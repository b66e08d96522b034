package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<double>` columns (embeddings are
  * stored float; cast first with [[toDoubleVec]]).
  *
  * Determinism: [[dot]] is a strict LEFT fold over the element products
  * in array order — the DuckDB oracle reproduces the identical IEEE-754
  * operation sequence (`list_reduce(list_prepend(0.0, [a[i]*b[i] ...]),
  * (s,v) -> s+v)`), making cosine values bit-identical cross-engine with
  * no rounding tolerance needed.
  *
  * Scale: these are per-row expressions (no shuffle). Brute-force top-k
  * broadcasts the query set; the IVF variant in queries/Similarity.scala
  * is the 100 TB path (centroid assignment prunes the candidate set to
  * nprobe/nlist of the data).
  */
object Vectors {

  /** float[] → double[] so all arithmetic is double-precision IEEE.
    * A direct array cast, NOT `transform(v, _.cast("double"))`: Cast
    * over ArrayType participates in whole-stage codegen while a
    * higher-order `transform` lambda evaluates interpreted
    * (CodegenFallback) on every row of every v-query.
    */
  def toDoubleVec(v: Column): Column = v.cast("array<double>")

  /** JVM kernel: Σ aᵢ·bᵢ, one rounding per multiply and per add, left to
    * right — the same IEEE operation sequence as the oracle's
    * `list_reduce(list_prepend(0.0, [a[i]*b[i] …]), (s,v) -> s+v)`.
    */
  def dotKernel(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Sequential left-fold dot product as a native codegen'd Catalyst
    * expression ([[DotProduct]]) — no catalyst↔Scala conversion, inlines
    * into whole-stage codegen.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      DotProduct(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Random-hyperplane LSH bucket: bit p of the bucket is set iff
    * Σ_d v[d]·s(p,d) > 0, where the sign s(p,d) ∈ {−1, +1} derives
    * deterministically from the portable hash of "p:d" (so the DuckDB
    * oracle reproduces the same hyperplanes symbolically). Left-fold
    * accumulation keeps the dot bit-exact cross-engine.
    */
  def lshBucket(v: Column, nPlanes: Int = 8, dim: Int = 64,
      planeOffset: Int = 0): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.LshBucket(
        org.apache.spark.sql.GraftSqlBridge.expression(v), nPlanes, dim, planeOffset))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Int8 scalar quantization of `v / nrm` — see [[QuantizeUnitI8]]. */
  def quantizeI8(v: Column, nrm: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      QuantizeUnitI8(
        org.apache.spark.sql.GraftSqlBridge.expression(v),
        org.apache.spark.sql.GraftSqlBridge.expression(nrm)))

  /** Cosine-nearest-centroid against an embedded codebook — see
    * [[NearestCentroid]]. `cents` are (c_id, centroid, norm) triples,
    * iterated in the given order with smallest-first tie-breaks;
    * callers sort by c_id to match the oracle's `ORDER BY cos DESC,
    * c_id` argmax.
    */
  def nearestCentroid(v: Column, nrm: Column,
      cents: Seq[(Long, Seq[Double], Double)]): Column = {
    require(cents.nonEmpty, "graft_nearest_centroid: empty codebook")
    val dim = cents.head._2.length
    org.apache.spark.sql.GraftSqlBridge.column(
      NearestCentroid(
        org.apache.spark.sql.GraftSqlBridge.expression(v),
        org.apache.spark.sql.GraftSqlBridge.expression(nrm),
        cents.map(_._1).toArray,
        cents.flatMap(_._2).toArray,
        cents.map(_._3).toArray, dim))
  }

  /** Exact integer dot over `array<bigint>` codes — see [[LongDot]]. */
  def longDot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      LongDot(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** Top-`w` nearest centroids (ids in rank order) — see
    * [[NearestCentroidsTopW]]; the two-level IVF's coarse router.
    */
  def nearestCentroidsTopW(v: Column, nrm: Column,
      cents: Seq[(Long, Seq[Double], Double)], w: Int): Column = {
    require(cents.nonEmpty, "graft_nearest_centroids_topw: empty codebook")
    val dim = cents.head._2.length
    org.apache.spark.sql.GraftSqlBridge.column(
      NearestCentroidsTopW(
        org.apache.spark.sql.GraftSqlBridge.expression(v),
        org.apache.spark.sql.GraftSqlBridge.expression(nrm),
        cents.map(_._1).toArray,
        cents.flatMap(_._2).toArray,
        cents.map(_._3).toArray, dim, w))
  }

  /** Shard-local argmax over a row-carried codebook — see
    * [[ShardNearest]]; the two-level IVF's fine step.
    */
  def shardNearest(v: Column, nrm: Column,
      scids: Column, sflat: Column, scns: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ShardNearest(
        org.apache.spark.sql.GraftSqlBridge.expression(v),
        org.apache.spark.sql.GraftSqlBridge.expression(nrm),
        org.apache.spark.sql.GraftSqlBridge.expression(scids),
        org.apache.spark.sql.GraftSqlBridge.expression(sflat),
        org.apache.spark.sql.GraftSqlBridge.expression(scns)))

  /** PQ codes of `v / nrm` against an embedded codebook — see
    * [[PqEncode]]; v11's compression step.
    */
  def pqEncode(v: Column, nrm: Column,
      cb: Array[Double], m: Int, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PqEncode(
        org.apache.spark.sql.GraftSqlBridge.expression(v),
        org.apache.spark.sql.GraftSqlBridge.expression(nrm), cb, m, k))

  /** ADC score from an embedded per-query LUT — see [[PqAdcDot]];
    * v11's candidate-scan scoring kernel.
    */
  def pqAdc(qIdx: Column, codes: Column,
      luts: Array[Double], m: Int, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PqAdcDot(
        org.apache.spark.sql.GraftSqlBridge.expression(qIdx),
        org.apache.spark.sql.GraftSqlBridge.expression(codes), luts, m, k))

  /** PQ codes of the residual `v / nrm − cents[cIdx]` — see
    * [[PqEncodeResidual]]; v12's IVFADC encoding step.
    */
  def pqEncodeResidual(v: Column, nrm: Column, cIdx: Column,
      cb: Array[Double], cents: Array[Double], m: Int, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PqEncodeResidual(
        org.apache.spark.sql.GraftSqlBridge.expression(v),
        org.apache.spark.sql.GraftSqlBridge.expression(nrm),
        org.apache.spark.sql.GraftSqlBridge.expression(cIdx), cb, cents, m, k))

  /** Executor-side per-query ADC LUT — see [[PqLuts]]; the distributed
    * query side of PQ serving (r15).
    */
  def pqLuts(v: Column, nrm: Column,
      cb: Array[Double], m: Int, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PqLuts(
        org.apache.spark.sql.GraftSqlBridge.expression(v),
        org.apache.spark.sql.GraftSqlBridge.expression(nrm), cb, m, k))

  /** Executor-side IVF probe routing (top-`nprobe` lists + base
    * offsets) — see [[PqProbes]]; the distributed query side of
    * IVFADC serving (r15).
    */
  def pqProbes(v: Column, nrm: Column,
      cids: Array[Long], cents: Array[Double], nprobe: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PqProbes(
        org.apache.spark.sql.GraftSqlBridge.expression(v),
        org.apache.spark.sql.GraftSqlBridge.expression(nrm),
        cids, cents, nprobe))

  /** ADC score from a column-carried LUT — see [[PqAdcFromLut]]; the
    * distributed ADC hot loop (r15).
    */
  def pqAdcLut(lut: Column, codes: Column, m: Int, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PqAdcFromLut(
        org.apache.spark.sql.GraftSqlBridge.expression(lut),
        org.apache.spark.sql.GraftSqlBridge.expression(codes), m, k))
}
