package graft.weather

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden end-to-end run at the real snapshot's shape (FIXTURES.md §1.1:
  * 146 locations, prefix-heavy names, 143/146 null oldName, three island
  * groups, some unresolvable coordinates) through refresh → ingest →
  * analytics — SURVEY.md §5 item 4.
  */
object GoldenPipelineSpec {
  val nProvinces = 20

  /** Geocoder fixture (companion object: lambdas read it via a static
    * module reference, so Spark closures don't drag the spec class in).
    * Resolves normalized Alpha/Beta names and stripped Gamma names;
    * Delta names never resolve (null-coords path).
    */
  val geocoder: String => Seq[GeoCandidate] = { q =>
    if (q.startsWith("Alpha"))
      Seq(GeoCandidate(q, 10.0 + q.takeRight(3).toInt * 0.01, 121.0, "PH", None))
    else if (q.startsWith("Beta")) {
      val i = q.takeRight(3).toInt
      Seq(GeoCandidate(q, 8.0 + i * 0.01, 123.0, "PH", Some(f"Province${i % nProvinces}%02d")))
    } else if (q.startsWith("Gamma") && !q.endsWith(" City")) {
      val i = q.takeRight(3).toInt
      Seq(GeoCandidate(q, 6.0 + i * 0.01, 125.0, "PH",
        Some(f"Greater Province${i % nProvinces}%02d Area"))) // substring branch
    } else Nil
  }

  def fetch(lat: Double, lon: Double): String =
    s"""{"weather":[{"main":"Clear","description":"clear"}],
       |"main":{"temp":${20.0 + lat},"feels_like":30.0,"temp_min":20.0,"temp_max":35.0,
       |"pressure":1010,"humidity":70},"wind":{"speed":2.0},"clouds":{"all":10},
       |"sys":{"sunrise":1700000000,"sunset":1700043200}}""".stripMargin.replaceAll("\n", "")
}

class GoldenPipelineSpec extends SparkSpec {

  import spark.implicits._
  import GoldenPipelineSpec._

  /** COMMITTED golden fixture: 146-row PSGC-ish cities table at the real
    * snapshot's shape (FIXTURES.md §1.1 — prefix-heavy names, 143/146
    * null oldName, leading-zero codes, three island groups). Reading the
    * committed parquet (not regenerating) pins byte-level shape: schema
    * nullability, string codes that would corrupt under type inference,
    * the exact null pattern.
    */
  private def golden(name: String): DataFrame =
    spark.read.parquet(getClass.getResource(s"/golden/$name.parquet").getPath)

  private def cities: DataFrame = golden("cities")

  private def provinces: DataFrame = golden("provinces")

  private def emptySnapshot: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[Row],
    LocationRefresh.mergeCitiesProvinces(cities, provinces).schema
      .add("latitude", "double").add("longitude", "double"))

  test("refresh at 146-row scale: dense ids, per-branch resolution, null-coord tail") {
    val snap = LocationRefresh.refresh(spark, cities, provinces, emptySnapshot, geocoder)
    assert(snap.count() === 146)
    // dense 1..146
    assert(snap.agg(min("location_id"), max("location_id"), countDistinct("location_id"))
      .head.toSeq === Seq(1L, 146L, 146L))
    // Alpha (null-state accept) + Beta (exact-province) + Gamma (substring,
    // " City"-stripped) resolve; Delta stays null
    val resolved = snap.filter(col("latitude").isNotNull)
    assert(resolved.count() === 138) // 146 - 8 Deltas (i % 18 == 17)
    assert(snap.filter(col("name").startsWith("Delta") && col("latitude").isNotNull).isEmpty)
    // every Gamma resolved through the stripped variant
    assert(snap.filter(col("name").startsWith("Gamma")).filter(col("latitude").isNull).isEmpty)
    // null-heavy oldName preserved
    assert(snap.filter(col("oldName").isNull).count() === 143)
  }

  test("second refresh with no changes geocodes nothing and keeps ids stable") {
    val first = LocationRefresh.refresh(spark, cities, provinces, emptySnapshot, geocoder)
    val acc = spark.sparkContext.longAccumulator("calls")
    val counting: String => Seq[GeoCandidate] =
      { q => acc.add(1); GoldenPipelineSpec.geocoder(q) }
    val second = LocationRefresh.refresh(spark, cities, provinces, first, counting)
    assert(acc.value === 0)
    val a = first.select("name", "province_name", "location_id", "latitude")
    val b = second.select("name", "province_name", "location_id", "latitude")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("ingest + analytics over the refreshed snapshot") {
    val snap = LocationRefresh.refresh(spark, cities, provinces, emptySnapshot, geocoder)
      .withColumnRenamed("name", "snap_name")
      .select(col("location_id"), col("snap_name").as("name"),
        col("province_name"), col("latitude"), col("longitude"))
    val now = Timestamp.valueOf("2024-12-20 12:00:00")
    // temperature derived from latitude (companion fetch) so results are assertable
    val (shredded, missed) = WeatherIngest.ingest(spark, snap, GoldenPipelineSpec.fetch, now)
    assert(shredded.count() === 138) // only resolved locations ingest
    assert(missed.isEmpty)           // every fetched row joins back to the dim
    // weather_id is assigned at write time (TableStore dense ids); mirror that here
    val facts = shredded.withColumn("weather_id",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("location_id"), col("data_datetime"))).cast("long"))

    val byProv = WeatherAnalytics.avgTempPerProvince(facts, lit(Timestamp.valueOf("2024-12-20 00:00:00")))
    assert(byProv.count() === nProvinces)
    // Alpha temps (lat 10.x) dominate: hottest province must contain an Alpha
    val latest = WeatherAnalytics.topKHottest(facts, 1).head
    assert(latest.getAs[String]("location_name").contains("Alpha"))
  }
}
