package graft.queries

/** DuckDB snippet builders mirroring graft.functions.{Text, Vectors}.
  *
  * Each builder emits SQL computing bit-for-bit the same value as its
  * Spark twin (same constants, same fold order, same integer modulus) so
  * the driver's hash-exact oracle compare holds. Single source of truth
  * for the shared constants lives here and in functions/Text.scala —
  * change both or neither (cross-checked by the verify gate).
  */
private[queries] object OracleDialect {

  /** Whitespace tokens, lowercased, empties dropped — Text.tokens. */
  val TOKS = "[t for t in string_split(lower(text), ' ') if t <> '']"

  /** Word 3-gram shingles — Text.shingles(n=3). */
  def shingles(tk: String): String =
    s"CASE WHEN len($tk) >= 3 THEN [array_to_string($tk[i:i+2], ' ') " +
      s"for i in range(1, len($tk)-1)] ELSE [] END"

  /** All word 2-gram shingles, duplicates kept — Text.shinglesAll(n=2). */
  def bigrams(tk: String): String =
    s"CASE WHEN len($tk) >= 2 THEN [array_to_string($tk[i:i+1], ' ') " +
      s"for i in range(1, len($tk))] ELSE [] END"

  /** Portable polynomial hash — Text.charFp. */
  def fp(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[CAST(ascii(c) AS BIGINT) for c in string_split($e, '') if c <> '']), " +
      s"(a, b) -> (a * 31 + b) % 2147483647)"

  /** MinHash signature (k=16) over a BIGINT[] column — Text.minhashSig. */
  def minhashSig(fps: String): String =
    s"[list_min([(fp * (37 + 101 * i) + 17 + 1009 * i) % 2147483647 " +
      s"for fp in $fps]) for i in range(0, 16)]"

  /** 32-bit SimHash over a BIGINT[] column — Text.simhash32. */
  def simhash32(fps: String): String =
    s"CAST(list_sum([CASE WHEN list_sum([CASE WHEN (fp >> b) & 1 = 1 " +
      s"THEN 1 ELSE -1 END for fp in $fps]) > 0 THEN (CAST(1 AS BIGINT) << b) " +
      s"ELSE 0 END for b in range(0, 32)]) AS BIGINT)"

  /** Function-word hit count — Text.stopHits (lists must match). */
  def stopHits(tk: String, lang: String): String = {
    val lst = graft.functions.Text.stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"len([t for t in $tk if list_contains([$lst], t)])"
  }

  /** `Σ floor(x·1e6)` AS BIGINT named `as` — the rounding-free way to
    * hash-compare a summed double score across engines: floor on
    * identical doubles is bit-exact, while double→DECIMAL casts round
    * differently per engine (the round-1 hash-mismatch root cause).
    */
  def sumMicros(x: String, as: String): String =
    s"CAST(sum(CAST(floor($x * 1000000.0) AS BIGINT)) AS BIGINT) AS $as"

  /** `floor(sum/count·1e6)` AS BIGINT named `as`, over an exactly
    * computed numerator (decimal-summed or integer) — the
    * cross-engine-exact mean (round()'s half-case differs per engine).
    */
  def avgMicros(sumExpr: String, as: String): String =
    s"CAST(floor($sumExpr / count(*) * 1000000.0) AS BIGINT) AS $as"

  /** The exact oracle's trivially-true twin of a sketch query's bound
    * flag: Spark derives the flag from ITS sketch's error contract,
    * the oracle asserts it is literally 1, so any accuracy regression
    * breaks the hash compare (the x01–x05 gate pattern).
    */
  def boundOk(as: String = "within_bound"): String = s"CAST(1 AS BIGINT) AS $as"

  /** Sequential left-fold dot product — Vectors.dot. */
  def dot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"[$a[i] * $b[i] for i in range(1, len($a) + 1)]), (a, b) -> a + b)"

  /** Cosine similarity — Vectors.cosine. */
  def cosine(a: String, b: String): String =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  /** Int8 codes of `v / nrm` — functions.QuantizeUnitI8 (same divide/
    * multiply/add/floor sequence, so codes are bit-exact). */
  def i8Codes(v: String, nrm: String): String =
    s"[CAST(floor(x / $nrm * 127.0 + 0.5) AS BIGINT) for x in $v]"

  /** Exact integer fold dot over BIGINT[] codes — functions.LongDot. */
  def longDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[$a[i] * $b[i] for i in range(1, len($a) + 1)]), (a, b) -> a + b)"
}
