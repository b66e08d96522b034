package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Error bounds for the approximate sketches (x01/x02) against their
  * exact twins. Since round 8 the declared queries themselves carry a
  * driver-gated `within_bound` flag (the DuckDB oracle emits literal 1,
  * so a sketch regression breaks the hash); this spec pins the SAME
  * bounds directly on the raw approx-vs-exact columns
  * ([[Relational.x01Raw]]/[[Relational.x02Raw]]) so a failure names the
  * offending group and error, and additionally asserts the declared
  * flag column is all-1 — i.e. the projection agrees with the spec.
  */
class SketchBoundsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("x01: HLL approx distinct within max(2x rsd of exact, 1 count), per group") {
    // the one-count absolute floor covers integer granularity at tiny
    // cardinalities (sf0.001 groups have exact ~ 4-13, where a +-1
    // estimate excursion is possible at any accuracy)
    val rows = Relational.x01Raw(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(r.fieldIndex("approx_customers")).toDouble
      val exact = r.getLong(r.fieldIndex("exact_customers")).toDouble
      assert(exact > 0, r.toString)
      val err = math.abs(approx - exact)
      assert(err <= math.max(2 * 0.02 * exact, 1.0),
        s"${r.getString(0)}: |$approx - $exact| = $err > max(0.04*$exact, 1)")
    }
  }

  test("x02: sketch p50/p99 land inside the exact rank window per priority") {
    // percentile_approx(accuracy=1000) guarantees rank error <= n/1000;
    // the assertion allows 10x that: the sketch value must fall between
    // the exact quantiles at q +/- 0.01 (p99's upper side is the max).
    val approx = Relational.x02Raw(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(percentile(col("o_totalprice"),
        array(lit(0.49), lit(0.51), lit(0.98), lit(1.0))).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(approx.keySet === exact.keySet)
    assert(approx.nonEmpty)
    approx.foreach { case (prio, (p50, p99)) =>
      val Seq(lo50, hi50, lo99, hi99) = exact(prio)
      assert(p50 >= lo50 && p50 <= hi50,
        s"$prio: sketch p50 $p50 outside exact [$lo50, $hi50]")
      assert(p99 >= lo99 && p99 <= hi99,
        s"$prio: sketch p99 $p99 outside exact [$lo99, $hi99]")
    }
  }

  test("declared x01/x02 within_bound flags are all 1 (driver-gate agreement)") {
    Seq("x01_approx_distinct", "x02_percentile_sketch").foreach { q =>
      val rows = graft.SparkEntry.queries(q)(spark, dir).collect()
      assert(rows.nonEmpty, q)
      rows.foreach { r =>
        assert(r.getLong(r.fieldIndex("within_bound")) == 1L, s"$q: $r")
      }
    }
  }

  test("x05: per-source AND merged-ALL HLL union estimates within max(3x rsd, 1)") {
    val rows = TextAnalysis.x05Raw(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.count(_.getString(0) == "ALL") == 1, "merged ALL row missing")
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("exact_distinct")).toDouble
      val est = r.get(r.fieldIndex("est")).toString.toDouble
      assert(exact > 0, r.toString)
      val err = math.abs(est - exact)
      assert(err <= math.max(3 * TextAnalysis.HllRsd * exact, 1.0),
        s"${r.getString(0)}: |$est - $exact| = $err > max(3*rsd*$exact, 1)")
    }
    val out = graft.SparkEntry.queries("x05_hll_union")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("within_bound")) == 1L, s"x05: $r")
    }
  }

  test("x04: CMS never underestimates ANY bigram; top-10 overestimate inside 4*eps*N") {
    import org.apache.spark.sql.functions._
    import graft.functions.Text
    // the declared query gates only the top-10; here the one-sided
    // guarantee is asserted over the ENTIRE vocabulary, and the
    // declared flags are re-checked
    val bigrams = graft.Tables(spark, dir, "documents")
      .select(explode(Text.shinglesAll(col("text"), 2)).as("bigram"))
    val row = bigrams.agg(
      expr("count_min_sketch(bigram, 0.001d, 0.99d, 42)").as("cms"),
      count(lit(1)).as("n")).first()
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    val exact = bigrams.groupBy("bigram").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    exact.foreach { case (b, n) =>
      assert(cms.estimateCount(b) >= n, s"CMS underestimated '$b': ${cms.estimateCount(b)} < $n")
    }
    val out = graft.SparkEntry.queries("x04_cms_heavy_hitters")(spark, dir).collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("never_under")) == 1L, r.toString)
      assert(r.getLong(r.fieldIndex("overest_bounded")) == 1L, r.toString)
    }
  }
}
