package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators (SURVEY.md §7.4):
  * tokenization, shingling, portable hashing, MinHash, SimHash, stopword
  * scoring. The dedup hot path (shingling, fingerprints, MinHash,
  * SimHash) runs as NATIVE codegen expressions (TextExprs/MinHashSig/
  * CharFp — no ScalaUDF conversion layer, inlined into whole-stage
  * codegen); the remaining per-row scorers are compiled-Scala statics
  * invoked FROM generated code (zero UDF registrations anywhere in
  * main — still JVM loops, never interpreted HOF lambdas, no Python).
  *
  * Cross-engine determinism: the polynomial hash [[charFp]] is defined
  * over Unicode code points with BIGINT arithmetic mod 2^31-1, an
  * expression the DuckDB oracle reproduces verbatim (see the paired SQL
  * in graft.queries.*). Spark's murmur3 `hash()` is NOT used anywhere an
  * oracle compares values, because its seed/implementation is
  * engine-private.
  */
object Text {

  /** 2^31 - 1 (Mersenne prime) — modulus for all portable hashes. */
  val P = 2147483647L

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Word n-gram shingles joined with single spaces; empty array when the
    * document is shorter than n (guards `sequence`'s descending-range
    * behavior for start > stop).
    */
  def shingles(tk: Column, n: Int = 3): Column =
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - (n - 1)), i => array_join(slice(tk, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  // -- hash kernels ---------------------------------------------------
  // These run as compiled JVM loops (native codegen expressions where
  // hot, codegen-called compiled statics otherwise), never Catalyst higher-order
  // functions: HOF lambdas evaluate interpreted (HigherOrderFunction is
  // CodegenFallback) and profiled ~25-50x slower than compiled loops on
  // the minhash inner loop (200s+ cold for 500 docs). Semantics are the
  // portability contract above — same fold order, same constants — so
  // the DuckDB oracle SQL is unchanged.

  /** JVM kernel of [[charFp]]. UTF-16 code units == code points for BMP
    * text (fixtures are ASCII), matching DuckDB's `ascii()`.
    */
  def charFpStr(s: String): Long = {
    var a = 0L
    var i = 0
    while (i < s.length) { a = (a * 31 + s.charAt(i)) % P; i += 1 }
    a
  }

  private[functions] def minhashOf(fps: Array[Long], k: Int): Array[Long] =
    Array.tabulate(k) { i =>
      val A = 37L + 101L * i
      val B = 17L + 1009L * i
      var m = Long.MaxValue
      var j = 0
      while (j < fps.length) {
        val h = (fps(j) * A + B) % P
        if (h < m) m = h
        j += 1
      }
      m
    }

  private[functions] def simhashOf(fps: Array[Long]): Long = {
    val counts = new Array[Int](32)
    var j = 0
    while (j < fps.length) {
      val fp = fps(j)
      var b = 0
      while (b < 32) {
        if (((fp >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** JVM kernel of tokens→distinct-shingles (ASCII semantics identical
    * to `array_distinct(shingles(tokens(text)))`): lowercase, split on
    * single spaces, drop empties, join n-grams with one space, distinct
    * preserving first occurrence.
    */
  def distinctShinglesStr(text: String, n: Int): Array[String] = {
    val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
    if (toks.length < n) Array.empty
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= toks.length) {
        val sb = new StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      seen.toArray(new Array[String](seen.size))
    }
  }

  /** [[distinctShinglesStr]] on UTF8String, returning Catalyst
    * ArrayData — the eval/codegen entry of the native
    * [[DistinctShingles]] expression (also called from generated code,
    * hence public).
    */
  def distinctShinglesArrayData(s: org.apache.spark.unsafe.types.UTF8String,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val arr = distinctShinglesStr(s.toString, n)
    val out = new Array[AnyRef](arr.length)
    var i = 0
    while (i < arr.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(arr(i)); i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Distinct word-3-gram shingles of a raw text column — native
    * codegen'd [[DistinctShingles]]; the hot first stage of every
    * dedup query.
    */
  def distinctShingles(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      DistinctShingles(org.apache.spark.sql.GraftSqlBridge.expression(text), n))

  /** JVM kernel of d09's passage chunking: lowercase whitespace tokens
    * grouped into NON-OVERLAPPING w-token passages (ragged tail kept),
    * each joined with single spaces — the compiled twin of
    * `transform(sequence(0, ⌊(n−1)/w⌋), i => array_join(slice(tk,
    * i·w+1, w), " "))`, which would otherwise evaluate as an
    * interpreted HOF lambda twice per d09 run.
    */
  def passagesStr(text: String, w: Int): Array[String] = {
    val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
    if (toks.length == 0) Array.empty
    else {
      val n = (toks.length + w - 1) / w
      val out = new Array[String](n)
      var c = 0
      while (c < n) {
        val start = c * w
        val end = math.min(start + w, toks.length)
        val sb = new StringBuilder(toks(start))
        var j = start + 1
        while (j < end) { sb.append(' ').append(toks(j)); j += 1 }
        out(c) = sb.toString
        c += 1
      }
      out
    }
  }

  /** JVM kernel of the hashed-linear-classifier score (c04): the
    * fasttext-style model-based quality filter. Each token hashes to
    * one of `d` feature buckets (fp % d); the doc score is the
    * frequency-weighted INTEGER dot product with the bucket weight
    * vector. Weights here are a deterministic closed form
    * (`(j·1103515245 + 12345) mod 2001 − 1000` ∈ [−1000, 1000], an
    * LCG step — the container ships no trained artifacts), standing in
    * for a broadcast trained vector; the plumbing (hashed features,
    * integer dot, threshold) is exactly what a real classifier filter
    * runs, and all-integer arithmetic keeps both engines bit-equal.
    */
  def classifierScoreStr(text: String, d: Int): Long = {
    val toks = text.toLowerCase.split(" ")
    var s = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        val j = charFpStr(t) % d
        s += (j * 1103515245L + 12345L) % 2001L - 1000L
      }
      i += 1
    }
    s
  }

  /** JVM kernel of d10's OVERLAPPING-window fingerprints (the
    * substring-level exact-dedup granularity of Lee et al. 2022,
    * window form): lowercase whitespace tokens; windows of `w` tokens
    * start at positions 0, s, 2s, … while pos + w ≤ n, PLUS the tail
    * window at n − w when the stride doesn't land on it — so every
    * token is covered by at least one window. A doc shorter than `w`
    * emits one whole-doc window; an empty doc none. Each window is
    * fingerprinted with the [[charFpStr]] recurrence over the
    * space-joined window string WITHOUT materializing it (the fold
    * walks token chars and injects the ' ' separator) — the 100 TB
    * shape: only 8-byte digests leave the scan, never ~40-token
    * strings. Output in ascending-position order, so the array index
    * is a within-doc occurrence rank.
    */
  def windowFpsArr(text: String, w: Int, s: Int): Array[Long] = {
    val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
    val n = toks.length
    if (n == 0) return Array.empty
    def fpOf(start: Int): Long = {
      val end = math.min(start + w, n)
      var a = 0L
      var j = start
      while (j < end) {
        if (j > start) a = (a * 31 + ' ') % P
        val t = toks(j)
        var i = 0
        while (i < t.length) { a = (a * 31 + t.charAt(i)) % P; i += 1 }
        j += 1
      }
      a
    }
    if (n <= w) Array(fpOf(0))
    else {
      val full = (n - w) / s + 1
      val tail = if ((n - w) % s != 0) 1 else 0
      val out = new Array[Long](full + tail)
      var c = 0
      while (c < full) { out(c) = fpOf(c * s); c += 1 }
      if (tail == 1) out(full) = fpOf(n - w)
      out
    }
  }

  /** [[windowFpsArr]] on UTF8String → Catalyst ArrayData — the
    * eval/codegen entry of the native [[WindowFps]] expression.
    */
  def windowFpsArrayData(t: org.apache.spark.unsafe.types.UTF8String,
      w: Int, s: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      windowFpsArr(t.toString, w, s))

  /** Overlapping `w`-token window fingerprints of a raw text column at
    * stride `s` — native codegen'd [[WindowFps]]; d10's window stage.
    */
  def windowFps(text: Column, w: Int = 40, s: Int = 20): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      WindowFps(org.apache.spark.sql.GraftSqlBridge.expression(text), w, s))

  /** Hashed-classifier score of a raw text column — native codegen'd
    * [[HashedClassifier]]; c04's scoring stage.
    */
  def classifierScore(text: Column, d: Int = 256): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      HashedClassifier(org.apache.spark.sql.GraftSqlBridge.expression(text), d))

  /** [[passagesStr]] on UTF8String → Catalyst ArrayData — the
    * eval/codegen entry of the native [[Passages]] expression.
    */
  def passagesArrayData(s: org.apache.spark.unsafe.types.UTF8String,
      w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val arr = passagesStr(s.toString, w)
    val out = new Array[AnyRef](arr.length)
    var i = 0
    while (i < arr.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(arr(i)); i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Non-overlapping w-token passages of a raw text column — native
    * codegen'd [[Passages]]; d09's chunking stage.
    */
  def passages(text: Column, w: Int = 8): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      Passages(org.apache.spark.sql.GraftSqlBridge.expression(text), w))

  /** ALL word n-gram shingles, duplicates kept in document order —
    * compiled twin of the HOF [[shingles]], for frequency counting
    * (t07) where multiplicity matters.
    */
  def shinglesAllStr(text: String, n: Int): Array[String] = {
    val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
    if (toks.length < n) Array.empty
    else Array.tabulate(toks.length - n + 1) { i =>
      val sb = new StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      sb.toString
    }
  }

  /** [[shinglesAllStr]] on UTF8String, returning Catalyst ArrayData —
    * the eval/codegen entry of the native [[ShinglesAll]] expression.
    */
  def shinglesAllArrayData(s: org.apache.spark.unsafe.types.UTF8String,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val arr = shinglesAllStr(s.toString, n)
    val out = new Array[AnyRef](arr.length)
    var i = 0
    while (i < arr.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(arr(i)); i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** All word n-gram shingles of a raw text column (non-distinct) —
    * native codegen'd [[ShinglesAll]]. */
  def shinglesAll(text: Column, n: Int = 2): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ShinglesAll(org.apache.spark.sql.GraftSqlBridge.expression(text), n))

  /** Portable polynomial rolling hash: fold over code points,
    * `acc = (acc * 31 + codepoint) mod P`, acc0 = 0. Equivalent DuckDB:
    * `list_reduce(list_prepend(0::BIGINT, [ascii(c)::BIGINT for c in
    * string_split(s,'') if c <> '']), (a,b) -> (a*31+b) % 2147483647)`.
    * Backed by the native codegen'd [[CharFp]] expression (same
    * recurrence as [[charFpStr]]).
    */
  def charFp(s: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      CharFp(org.apache.spark.sql.GraftSqlBridge.expression(s)))

  /** Fingerprints of an array of shingles — native codegen'd
    * [[FpsExpr]], one charFp per element, primitive-array output. */
  def fps(sh: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      FpsExpr(org.apache.spark.sql.GraftSqlBridge.expression(sh)))

  /** MinHash signature over an array of shingle fingerprints: k universal
    * permutations `h_i(x) = (A_i x + B_i) mod P` with A_i = 37 + 101 i,
    * B_i = 17 + 1009 i. Returns array<bigint> of length k. Empty input →
    * null (array_min-over-empty semantics).
    */
  def minhashSig(fpsCol: Column, k: Int = 16): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      MinHashSig(org.apache.spark.sql.GraftSqlBridge.expression(fpsCol), k))

  /** 32-bit SimHash over an array of feature fingerprints: bit b is set
    * iff the count of features with bit b set exceeds those without.
    */
  def simhash32(fpsCol: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SimHash32(org.apache.spark.sql.GraftSqlBridge.expression(fpsCol)))

  /** JVM kernel of the t03 quality score — the SAME IEEE double op
    * sequence as the oracle SQL (term order, left-assoc adds, one
    * division per term), so values stay bit-identical while the whole
    * per-row computation compiles to a single JVM loop instead of four
    * interpreted Catalyst HOF lambdas (measured 33.5 s → the HOF trap
    * documented above).
    *
    *   0.25·min(1, n/80) + 0.25·TTR
    * + 0.25·(1 − min(1, |sumLen/n − 5|/10)) + 0.25·min(1, 10·stop/n)
    */
  def qualityScoreStr(text: String): Double = {
    val toks = text.toLowerCase.split(" ")
    val seen = new java.util.HashSet[String]()
    var n = 0
    var sumLen = 0L
    var stop = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        n += 1
        sumLen += t.length
        if (enStops.contains(t)) stop += 1
        seen.add(t)
      }
      i += 1
    }
    val nd = n.toDouble
    0.25 * math.min(1.0, nd / 80) +
      0.25 * (seen.size.toDouble / n) +
      0.25 * (1.0 - math.min(1.0, math.abs(sumLen.toDouble / n - 5.0) / 10)) +
      0.25 * math.min(1.0, 10.0 * stop / n)
  }

  // lazy: `stopwords` is declared further down in this object
  private lazy val enStops: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords("en").foreach(s.add)
    s
  }

  /** Compiled quality score over the raw text column (tokenize + score
    * in one pass; null text → null score) — native codegen'd
    * [[QualityScore]].
    */
  def qualityScore(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      QualityScore(org.apache.spark.sql.GraftSqlBridge.expression(text)))

  /** JVM kernel of t01's per-document token statistics: token count,
    * distinct count, summed token length — one compiled pass replacing
    * three interpreted HOF lambdas over the same array.
    */
  def tokenStatsStr(text: String): (Int, Int, Long) = {
    val toks = text.toLowerCase.split(" ")
    val seen = new java.util.HashSet[String]()
    var n = 0
    var sumLen = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) { n += 1; sumLen += t.length; seen.add(t) }
      i += 1
    }
    (n, seen.size, sumLen)
  }

  /** [[tokenStatsStr]] on UTF8String, returning a Catalyst row — the
    * eval/codegen entry of the native [[TokenStats]] expression (also
    * called from generated code, hence public).
    */
  def tokenStatsRow(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val (n, d, l) = tokenStatsStr(s.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, d, l))
  }

  /** Token stats as a struct column (n_tokens, n_distinct, sum_len) —
    * native codegen'd [[TokenStats]], tuple field names preserved. */
  def tokenStats(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      TokenStats(org.apache.spark.sql.GraftSqlBridge.expression(text)))

  /** Per-doc term frequencies `(term, tf)` in first-occurrence order —
    * the map-side tf kernel: a document's tokens all live in its own
    * row, so the doc-term matrix never needs the `(doc_id, term)`
    * shuffle that `explode → groupBy` pays (every raw pair crossed the
    * wire just to be merge-counted with itself). Counts are identical
    * to `groupBy(doc_id, term).count()` over [[tokens]] by
    * construction — same tokenizer, exact integer counts — so t13's
    * hash gate is unaffected by the rewrite.
    */
  def termCountsArrayData(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = s.toString.toLowerCase.split(" ")
    val counts = new java.util.LinkedHashMap[String, Long]
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) counts.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[AnyRef](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(e.getKey),
          e.getValue))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** `array<struct<term, tf>>` column — native codegen'd [[TermCounts]]. */
  def termCounts(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      TermCounts(org.apache.spark.sql.GraftSqlBridge.expression(text)))

  /** One-pass document length + per-query-term frequencies — t14's
    * kernel (r11): `struct<dl: int, tf: array<int>>` where `dl` counts
    * the non-empty lowercased tokens and `tf(i)` counts tokens equal
    * to `terms(i)`. Replaces a tokenization HOF plus one array_remove
    * COPY of the token array per query term, per pass — the BM25
    * shape needs the corpus twice (stats, then scoring), so the old
    * form paid 2 interpreted tokenizations and 6 array copies per doc.
    */
  def queryTfRow(s: org.apache.spark.unsafe.types.UTF8String,
      terms: Array[String]): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = s.toString.toLowerCase.split(" ")
    var dl = 0
    val tf = new Array[Int](terms.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        dl += 1
        var j = 0
        while (j < terms.length) {
          if (t == terms(j)) tf(j) += 1
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](dl,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(tf)))
  }

  /** `struct<dl, tf>` column — native codegen'd [[QueryTf]]. */
  def queryTf(text: Column, terms: Seq[String]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      QueryTf(org.apache.spark.sql.GraftSqlBridge.expression(text), terms))

  /** Tiny function-word lists for the n-gram language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "un"))

  /** Number of tokens that are function words of `lang`. */
  def stopHits(tk: Column, lang: String): Column =
    size(filter(tk, t => t.isInCollection(stopwords(lang))))

  private val StopSets: Array[java.util.HashSet[String]] =
    Array("en", "es", "de", "fr").map { l =>
      val s = new java.util.HashSet[String]()
      stopwords(l).foreach(s.add)
      s
    }

  /** All four languages' function-word hit counts in ONE tokenization
    * and ONE pass — the compiled twin of four [[stopHits]] calls
    * (which are Catalyst HOF `filter` lambdas: interpreted, and t02
    * paid 4 tokenizations × an interpreted scan each). Counts are
    * identical to `stopHits(tokens(text), lang)` per lang by
    * construction — same tokenizer, same membership lists.
    */
  def langHitsRow(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val toks = s.toString.toLowerCase.split(" ")
    val h = new Array[Int](4)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        var l = 0
        while (l < 4) { if (StopSets(l).contains(t)) h(l) += 1; l += 1 }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](h(0), h(1), h(2), h(3)))
  }

  /** struct<h_en, h_es, h_de, h_fr> column — native codegen'd [[LangHits]]. */
  def langHits(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      LangHits(org.apache.spark.sql.GraftSqlBridge.expression(text)))
}
