package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextSpec extends SparkSpec {
  import Text._

  private def evalOne(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head.get(0)
  }

  test("charFp matches the reference fold ((0*31+c)%P …)") {
    // hand-computed: h('ab') = (0*31+97)*31+98 mod P = 3105
    assert(evalOne(charFp(lit("ab"))) === (97L * 31 + 98))
    assert(evalOne(charFp(lit(""))) === 0L)
    // matches the DuckDB prototype value for 'hello world'
    assert(evalOne(charFp(lit("hello world"))) === 1835087470L)
  }

  test("tokens lowercases and drops empties") {
    assert(evalOne(tokens(lit("The  quick Fox"))) ===
      Seq("the", "quick", "fox"))
  }

  test("shingles produces word n-grams; short docs yield empty") {
    assert(evalOne(shingles(tokens(lit("a b c d")), 3)) === Seq("a b c", "b c d"))
    assert(evalOne(shingles(tokens(lit("a b c")), 3)) === Seq("a b c"))
    assert(evalOne(shingles(tokens(lit("a b")), 3)) === Seq())
  }

  test("minhashSig is k-long, order-insensitive over the set") {
    import spark.implicits._
    val sig1 = Seq("a b c d e").toDF("text")
      .select(minhashSig(transform(array_distinct(shingles(tokens(col("text")), 3)),
        s => charFp(s))).as("sig")).head.getSeq[Long](0)
    assert(sig1.length === 16)
    assert(sig1.forall(v => v >= 0 && v < 2147483647L))
  }

  test("simhash32 close for near-identical docs, far for disjoint") {
    import spark.implicits._
    def sig(text: String): Long =
      Seq(text).toDF("text")
        .select(Text.simhash32(transform(array_distinct(shingles(tokens(col("text")), 3)),
          s => charFp(s))).as("s")).head.getLong(0)
    val a = sig("the quick brown fox jumps over the lazy dog again and again")
    val b = sig("the quick brown fox jumps over the lazy dog again and often")
    val c = sig("completely different words appear here with nothing shared at all")
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, b) < ham(a, c))
  }

  test("stopHits counts function words") {
    assert(evalOne(stopHits(tokens(lit("the cat and the hat")), "en")) === 3)
    assert(evalOne(stopHits(tokens(lit("no hits here")), "es")) === 0)
  }

  // --- compiled-kernel ↔ HOF parity: the kernels replaced interpreted
  //     Catalyst lambdas in t01/t03/t07; these pin value equivalence ---

  private val parityTexts = Seq(
    "The quick brown Fox jumps over the lazy dog",
    "a b c", "single", "", "  double  spaces  here  ",
    "the the the the repeated of and to a words")

  test("tokenStatsStr matches the HOF formulation (count/distinct/sumLen)") {
    import spark.implicits._
    for (t <- parityTexts) {
      val viaHof = Seq(t).toDF("text")
        .select(tokens(col("text")).as("tk"))
        .select(size(col("tk")), size(array_distinct(col("tk"))),
          aggregate(transform(col("tk"), x => length(x).cast("long")),
            lit(0L), (a, x) => a + x))
        .head
      val (n, d, len) = tokenStatsStr(t)
      assert((n, d, len) === (viaHof.getInt(0), viaHof.getInt(1), viaHof.getLong(2)), t)
    }
  }

  test("qualityScoreStr matches the HOF score expression bit-for-bit") {
    import spark.implicits._
    for (t <- parityTexts if t.trim.nonEmpty) {
      val tkc = tokens(col("text"))
      val n = size(tkc)
      val sumLen = aggregate(transform(tkc, x => length(x).cast("long")), lit(0L), (a, x) => a + x)
      val hofScore = lit(0.25) * least(lit(1.0), n.cast("double") / lit(80)) +
        lit(0.25) * (size(array_distinct(tkc)).cast("double") / n) +
        lit(0.25) * (lit(1.0) - least(lit(1.0), abs(sumLen.cast("double") / n - lit(5.0)) / lit(10))) +
        lit(0.25) * least(lit(1.0), lit(10.0) * stopHits(tkc, "en") / n)
      val viaHof = Seq(t).toDF("text").select(hofScore).head.getDouble(0)
      assert(java.lang.Double.doubleToLongBits(qualityScoreStr(t)) ===
        java.lang.Double.doubleToLongBits(viaHof), t)
    }
  }

  test("shinglesAllStr matches the HOF shingles (duplicates kept, in order)") {
    import spark.implicits._
    for (t <- parityTexts) {
      val viaHof = Seq(t).toDF("text")
        .select(shingles(tokens(col("text")), 2).as("sh"))
        .head.getSeq[String](0)
      assert(shinglesAllStr(t, 2).toSeq === viaHof, t)
    }
  }

  test("langHits equals four stopHits HOF columns (t02/c05's rewrite contract)") {
    import spark.implicits._
    for (t <- parityTexts) {
      val viaKernel = Seq(t).toDF("text")
        .select(Text.langHits(col("text")).as("lh"))
        .select(col("lh.h_en"), col("lh.h_es"), col("lh.h_de"), col("lh.h_fr"))
        .head()
      val viaHof = Seq(t).toDF("text")
        .select(stopHits(tokens(col("text")), "en"), stopHits(tokens(col("text")), "es"),
          stopHits(tokens(col("text")), "de"), stopHits(tokens(col("text")), "fr"))
        .head()
      assert((0 to 3).map(viaKernel.getInt) === (0 to 3).map(viaHof.getInt), t)
    }
  }

  test("termCounts equals explode(tokens) → groupBy counting (t13's rewrite contract)") {
    import spark.implicits._
    for (t <- parityTexts) {
      val viaKernel = Seq(t).toDF("text")
        .select(explode(Text.termCounts(col("text"))).as("tc"))
        .select(col("tc.term"), col("tc.tf"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val viaGroup = Seq(t).toDF("text")
        .select(explode(tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("tf"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaKernel === viaGroup, t)
    }
  }
}
