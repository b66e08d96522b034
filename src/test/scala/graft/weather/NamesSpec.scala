package graft.weather

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scala and Column forms of the name normalizers agree (C1/C2). */
class NamesSpec extends SparkSpec {

  import spark.implicits._

  private val cases = Seq(
    "City of Manila", "Municipality of Pateros", "Barangay Uno",
    "Town of X", "Quezon City", "Isabela", "City of Isabela City",
    " City", "Manila")

  test("normalizeCityName strips exactly one leading prefix then trims") {
    assert(Names.normalizeCityName("City of Manila") === "Manila")
    assert(Names.normalizeCityName("Municipality of Pateros") === "Pateros")
    assert(Names.normalizeCityName("Quezon City") === "Quezon City") // suffix untouched
    assert(Names.normalizeCityName("City of Isabela City") === "Isabela City") // one strip only
  }

  test("stripCitySuffix drops the trailing ' City' only") {
    assert(Names.stripCitySuffix("Quezon City") === Some("Quezon"))
    assert(Names.stripCitySuffix("Manila") === None)
  }

  test("Column forms agree with the Scala forms on all cases") {
    val df = cases.toDF("name").select(
      col("name"),
      Names.normalizeCityNameCol(col("name")).as("norm"),
      Names.stripCitySuffixCol(col("name")).as("stripped"))
    df.collect().foreach { r =>
      val n = r.getString(0)
      assert(r.getString(1) === Names.normalizeCityName(n), s"norm('$n')")
      assert(r.getString(2) === Names.stripCitySuffix(n).getOrElse(n), s"strip('$n')")
    }
  }
}
