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

  private val dir = "/root/testdata/sf0.001"

  private val moneyCols = Seq(
    "lineitem" -> Seq("l_extendedprice", "l_discount", "l_quantity", "l_tax"),
    "orders" -> Seq("o_totalprice"),
    "customer" -> Seq("c_acctbal"),
    "supplier" -> Seq("s_acctbal"),
    "events" -> Seq("value"))

  test("every cents-rewritten money column is an exact 2-decimal value " +
      "whose cents long equals dec2's unscaled value") {
    for ((table, cols) <- moneyCols; c <- cols) {
      val df = graft.Tables(spark, dir, table)
      // exact 2-decimal: the decimal(18,2) round-trip preserves the double
      val notTwoDec = df.filter(
        col(c).cast(DecimalType(18, 2)).cast("double") =!= col(c)).count()
      assert(notTwoDec === 0L, s"$table.$c: $notTwoDec values are not exact 2-decimal")
      // cents mapping: round(x*100) == dec2(x) * 100 (the unscaled value)
      val centsMismatch = df.filter(
        round(col(c) * lit(100)).cast("long") =!=
          (col(c).cast(DecimalType(18, 2)) * lit(100)).cast("long")).count()
      assert(centsMismatch === 0L, s"$table.$c: $centsMismatch cents mismatches")
    }
  }
}
