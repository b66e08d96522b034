package graft.weather

import graft.SparkSpec

/** J2 diff semantics with null-heavy frames (oldName is 143/146 null in
  * the real snapshot) — SURVEY.md §5 items 1-2.
  */
class LocationDiffSpec extends SparkSpec {

  private val cols = Seq("code", "name", "oldName")

  private def df(rows: (String, String, Option[String])*) = {
    import spark.implicits._
    rows.toDF("code", "name", "oldName")
  }

  test("diff(a, a) is empty even with nulls (pandas NaN==NaN parity)") {
    val a = df(("01", "Manila", None), ("02", "Cebu", Some("Sugbo")))
    assert(LocationDiff.symmetricDiff(a, a, cols).isEmpty)
    assert(!LocationDiff.hasChanges(a, a, cols))
  }

  test("null != value counts as a change") {
    val a = df(("01", "Manila", None))
    val b = df(("01", "Manila", Some("Maynila")))
    val d = LocationDiff.symmetricDiff(a, b, cols)
    assert(d.count() === 2) // one left_only + one right_only
  }

  test("symmetric: rows only in either side appear, tagged") {
    val a = df(("01", "Manila", None), ("02", "Cebu", None))
    val b = df(("02", "Cebu", None), ("03", "Davao", None))
    val d = LocationDiff.symmetricDiff(a, b, cols)
      .collect().map(r => (r.getString(0), r.getString(3))).toSet
    assert(d === Set(("01", "left_only"), ("03", "right_only")))
  }

  test("duplicate rows respect multiplicity (exceptAll, pandas-merge-like)") {
    val a = df(("01", "Manila", None), ("01", "Manila", None))
    val b = df(("01", "Manila", None))
    assert(LocationDiff.symmetricDiff(a, b, cols).count() === 1)
  }
}
