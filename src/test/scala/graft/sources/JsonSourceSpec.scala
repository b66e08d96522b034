package graft.sources

import graft.SparkSpec
import graft.weather.Schemas

class JsonSourceSpec extends SparkSpec {

  test("JSON array payload shreds against the explicit schema (S1)") {
    val payload =
      """[{"code":"012805000","name":"Adams","isCapital":false,
        |  "provinceCode":"012800000","regionCode":"010000000",
        |  "islandGroupCode":"luzon","psgc10DigitCode":"0102805000"},
        | {"code":"012801000","name":"Bangui","oldName":null,"isCapital":false,
        |  "provinceCode":"012800000","regionCode":"010000000",
        |  "islandGroupCode":"luzon","psgc10DigitCode":"0102801000"}]""".stripMargin
    val df = JsonSource.fromPayload(spark, Some(payload), Schemas.psgcCities)
    assert(df.count() === 2)
    val r = df.filter(df("name") === "Adams").head()
    assert(r.getAs[String]("code") === "012805000") // leading zero preserved: string code
    assert(r.getAs[Boolean]("isCapital") === false)
    assert(r.isNullAt(r.fieldIndex("oldName")))
  }

  test("fetch failure (None) yields an empty, schema-correct relation (:47-48)") {
    val df = JsonSource.fromPayload(spark, None, Schemas.psgcCities)
    assert(df.isEmpty)
    assert(df.schema === Schemas.psgcCities)
  }

  test("malformed payload degrades to empty, never throws") {
    val df = JsonSource.fromPayload(spark, Some("not json at all"), Schemas.psgcCities)
    assert(df.filter(df("code").isNotNull).isEmpty)
  }
}
