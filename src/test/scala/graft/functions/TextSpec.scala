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
}
