package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Error bounds for the approximate sketches (x01/x02) against their
  * exact twins — the driver can only rows-check these (HLL/KLL
  * internals are engine-specific), so the accuracy contract is pinned
  * here instead: x01's HLL estimate within 2× its configured rsd of
  * the exact distinct count per group, and x02's KLL percentile values
  * inside a 10×-margin exact rank window around the requested quantile.
  */
class SketchBoundsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("x01: HLL approx distinct within 2x the configured rsd of exact, per group") {
    val rows = graft.SparkEntry.queries("x01_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(r.fieldIndex("approx_customers")).toDouble
      val exact = r.getLong(r.fieldIndex("exact_customers")).toDouble
      assert(exact > 0, r.toString)
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 2 * 0.02,
        s"${r.getString(0)}: |$approx - $exact|/$exact = $relErr > 0.04")
    }
  }

  test("x02: sketch p50/p99 land inside the exact rank window per priority") {
    // percentile_approx(accuracy=1000) guarantees rank error <= n/1000;
    // the assertion allows 10x that: the sketch value must fall between
    // the exact quantiles at q +/- 0.01 (p99's upper side is the max).
    val approx = graft.SparkEntry.queries("x02_percentile_sketch")(spark, dir)
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
}
