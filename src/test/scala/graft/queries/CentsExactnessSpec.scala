package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

/** Pins the premise of the r20 integer-cents aggregate rewrites
  * (Relational.sumE2 / revenueSumE4): every money column those rewrites
  * touch holds EXACT 2-decimal values, and `round(x·100)` recovers
  * exactly dec2(x)'s unscaled value — so a cents-long sum cast to
  * double is bit-identical to the decimal sum's final double cast
  * (both are one correct rounding of the same exact rational, while
  * |Σ cents| < 2^53; the fixtures sit four decades below that).
  *
  * If a future fixture regeneration ships a money value with more than
  * two decimals, THIS spec is the loud early failure — the oracle gates
  * would fail too, but far less legibly.
  */
class CentsExactnessSpec extends SparkSpec {

  /** Every local SF dir, plus the bench dir when the runner points one
    * (r20 ADVICE — the premise must be pinned at the scale the bench
    * measures, not only at the smallest fixture): a violated premise at
    * a larger SF would otherwise surface as an opaque oracle hash
    * mismatch instead of this spec's legible failure.
    */
  private val dirs: Seq[String] =
    (Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      ++ sys.env.get("SPARK_GRAFT_SF_DIR")).distinct
      .filter(d => new java.io.File(d).isDirectory)

  private val moneyCols = Seq(
    "lineitem" -> Seq("l_extendedprice", "l_discount", "l_quantity", "l_tax"),
    "orders" -> Seq("o_totalprice"),
    "customer" -> Seq("c_acctbal"),
    "supplier" -> Seq("s_acctbal"),
    "events" -> Seq("value"))

  test("every cents-rewritten money column is an exact 2-decimal value " +
      "whose cents long equals dec2's unscaled value") {
    for (dir <- dirs; (table, cols) <- moneyCols; c <- cols) {
      val df = graft.Tables(spark, dir, table)
      // exact 2-decimal: the decimal(18,2) round-trip preserves the double
      val notTwoDec = df.filter(
        col(c).cast(DecimalType(18, 2)).cast("double") =!= col(c)).count()
      assert(notTwoDec === 0L, s"$dir $table.$c: $notTwoDec values are not exact 2-decimal")
      // cents mapping: round(x*100) == dec2(x) * 100 (the unscaled value)
      val centsMismatch = df.filter(
        round(col(c) * lit(100)).cast("long") =!=
          (col(c).cast(DecimalType(18, 2)) * lit(100)).cast("long")).count()
      assert(centsMismatch === 0L, s"$dir $table.$c: $centsMismatch cents mismatches")
    }
  }

  test("the 2^53 exactness bound holds with headroom at every checked SF " +
      "(table-total |cents| bounds any group sum's magnitude)") {
    for (dir <- dirs; (table, cols) <- moneyCols; c <- cols) {
      val df = graft.Tables(spark, dir, table)
      // Σ|cents·100| ≥ |Σ over ANY subgroup of the e4-unit products|
      // (the e4 form's per-item factor is ≤ 100: revenueSumE4 multiplies
      // cents by (100 − disc_e2) with disc_e2 ≥ 0), so one table-total
      // bounds every group sum any query can form.
      val row = df.agg(
        sum(abs(round(col(c) * lit(100)).cast("long")) * lit(100L)).as("e4")).head()
      val worst = if (row.isNullAt(0)) 0L else row.getLong(0)
      // require ≥ 8x headroom below 2^53 so replica scaling has room;
      // sumE2's scaladoc documents where the bound lands at SF1000
      assert(worst < (1L << 53) / 8,
        s"$dir $table.$c: table-total e4 units $worst within 8x of 2^53 — " +
          "the integer-cents rewrite premise is running out of headroom")
    }
  }
}
