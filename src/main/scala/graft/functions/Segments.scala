package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

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

  // Compiled-Scala UDF kernels, not Catalyst HOFs: the substring loops
  // are the hot path and HOF lambdas evaluate interpreted (see
  // functions/Text.scala). Neither appears in any oracle-compared
  // column — the blocking is lossless, so the oracle keeps the plain
  // quadratic formulation.

  /** array<struct<_1:int,_2:string>> of [[segmentsOf]]. */
  def segments(name: Column, tau: Int = Tau): Column =
    udf((s: String) => if (s == null) null else segmentsOf(s, tau)).apply(name)

  /** array<struct<_1:int,_2:int,_3:string>> of [[probesOf]]. */
  def probes(name: Column, tau: Int = Tau): Column =
    udf((s: String) => if (s == null) null else probesOf(s, tau)).apply(name)
}
