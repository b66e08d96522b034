package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** PassJoin-style segment blocking for threshold edit-distance joins
  * (Li/Deng/Feng, "Pass-Join: A Partition-based Method for Similarity
  * Joins", PVLDB 5(3), 2011 — public literature).
  *
  * Pigeonhole lemma: if ed(a, b) <= tau with |a| <= |b| and `a` is
  * partitioned into tau+1 contiguous segments, at least one segment is
  * untouched by any of the <= tau edits, so it occurs verbatim in `b`
  * with its start position shifted by at most tau (each edit shifts the
  * alignment by at most one). Candidate generation for the self-join is
  * therefore a plain equi-join of every string's segments against every
  * string's position-windowed substrings — O(tau²) probe rows per string
  * instead of all pairs per block, i.e. near-LINEAR in the input. The
  * (possibly superset) candidates are then verified with the banded
  * levenshtein, so the blocked join is EXACT (no recall loss) for the
  * ed <= tau predicate.
  *
  * The window used here is the simple lossless one (start within
  * ±tau of the segment's position in the shorter string); the paper's
  * multi-match-aware window is tighter but prunes only constants.
  *
  * Selectivity scales with segment length ≈ |s| / (tau+1): smaller tau
  * means longer, rarer segments. d08 runs tau=2 over 40-char keys
  * (13-char segments); tau=5 on ~10-char strings degenerates (1-2 char
  * segments match everything — measured 13% of all pairs as candidates
  * on the document fixtures), which is why q24's short-name stats use
  * vocabulary collapse instead of blocking.
  */
object Segments {

  /** Default edit-distance threshold for near-dup keys. */
  val Tau = 2

  /** Segment start offsets for a string of length l cut into k pieces:
    * k+1 cumulative positions, even partition with the remainder spread
    * over the last l%k segments (any fixed scheme works; both sides
    * must agree).
    */
  private def segBounds(l: Int, k: Int): Array[Int] = {
    val base = l / k
    val rem = l % k
    val pos = new Array[Int](k + 1)
    var i = 0
    while (i < k) {
      pos(i + 1) = pos(i) + base + (if (i >= k - rem) 1 else 0)
      i += 1
    }
    pos
  }

  /** Index side: the tau+1 (segment_index, segment_text) pieces of s in
    * the "shorter string" role.
    */
  def segmentsOf(s: String, tau: Int): Array[(Int, String)] = {
    val k = tau + 1
    val pos = segBounds(s.length, k)
    Array.tabulate(k)(i => (i, s.substring(pos(i), pos(i + 1))))
  }

  /** Probe side: for every possible shorter-side length lr in
    * [len(s)-tau, len(s)] and every segment index i, all substrings of s
    * with the segment's length starting within ±tau of the segment's
    * position in the length-lr partition — deduped per (lr, i, text).
    * Bounded by (tau+1)² · (2·tau+1) tuples per string, independent of
    * corpus size.
    */
  def probesOf(s: String, tau: Int): Array[(Int, Int, String)] = {
    val k = tau + 1
    val ls = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    val seen = new java.util.HashSet[String]()
    var lr = math.max(0, ls - tau)
    while (lr <= ls) {
      val pos = segBounds(lr, k)
      var i = 0
      while (i < k) {
        val len = pos(i + 1) - pos(i)
        var st = math.max(0, pos(i) - tau)
        val hi = math.min(ls - len, pos(i) + tau)
        while (st <= hi) {
          val sub = s.substring(st, st + len)
          if (seen.add(s"$lr:$i:$sub")) out += ((lr, i, sub))
          st += 1
        }
        i += 1
      }
      lr += 1
    }
    out.toArray
  }

  /** [[segmentsOf]] as Catalyst data — the codegen kernels' shared
    * converter (one static call from both eval and generated code).
    */
  def segmentsData(s: UTF8String, tau: Int): ArrayData = {
    val segs = segmentsOf(s.toString, tau)
    val rows = new Array[Any](segs.length)
    var i = 0
    while (i < segs.length) {
      rows(i) = new GenericInternalRow(
        Array[Any](segs(i)._1, UTF8String.fromString(segs(i)._2)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** [[probesOf]] as Catalyst data. */
  def probesData(s: UTF8String, tau: Int): ArrayData = {
    val ps = probesOf(s.toString, tau)
    val rows = new Array[Any](ps.length)
    var i = 0
    while (i < ps.length) {
      rows(i) = new GenericInternalRow(
        Array[Any](ps(i)._1, ps(i)._2, UTF8String.fromString(ps(i)._3)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  // Native codegen expressions (NOT Scala UDFs): the substring loops are
  // d08's candidate-generation hot path; as expressions they inline into
  // whole-stage codegen with no ScalaUDF converter layer, same promotion
  // every other kernel got (functions/TextExprs.scala). Neither appears
  // in any oracle-compared column — the blocking is lossless, so the
  // oracle keeps the plain quadratic formulation.

  /** array<struct<_1:int,_2:string>> of [[segmentsOf]]. */
  def segments(name: Column, tau: Int = Tau): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SegmentsExpr(org.apache.spark.sql.GraftSqlBridge.expression(name), tau))

  /** array<struct<_1:int,_2:int,_3:string>> of [[probesOf]]. */
  def probes(name: Column, tau: Int = Tau): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ProbesExpr(org.apache.spark.sql.GraftSqlBridge.expression(name), tau))
}

/** Codegen form of [[Segments.segmentsOf]] (PassJoin index side). */
case class SegmentsExpr(child: Expression, tau: Int = Segments.Tau)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_segments expects a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", IntegerType, nullable = false),
    StructField("_2", StringType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_segments"

  override def nullSafeEval(input: Any): Any =
    Segments.segmentsData(input.asInstanceOf[UTF8String], tau)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Segments.segmentsData($c, $tau);")

  override protected def withNewChildInternal(newChild: Expression): SegmentsExpr =
    copy(child = newChild)
}

/** Codegen form of [[Segments.probesOf]] (PassJoin probe side). */
case class ProbesExpr(child: Expression, tau: Int = Segments.Tau)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_probes expects a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", IntegerType, nullable = false),
    StructField("_2", IntegerType, nullable = false),
    StructField("_3", StringType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_probes"

  override def nullSafeEval(input: Any): Any =
    Segments.probesData(input.asInstanceOf[UTF8String], tau)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Segments.probesData($c, $tau);")

  override protected def withNewChildInternal(newChild: Expression): ProbesExpr =
    copy(child = newChild)
}
