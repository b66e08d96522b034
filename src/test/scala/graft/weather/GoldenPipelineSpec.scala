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

  /** Deterministic 146-row PSGC-ish cities table. */
  private def cities: DataFrame = {
    val rows = (0 until 146).map { i =>
      val prov = i % nProvinces
      val name = i % 18 match {
        case x if x < 8  => f"City of Alpha$i%03d"
        case x if x < 16 => f"Municipality of Beta$i%03d"
        case 16          => f"Gamma$i%03d City"
        case _           => f"Delta$i%03d"
      }
      val oldName = if (i % 50 == 0) Some(f"Old$i%03d") else None // 3/146 non-null
      val island = if (i % 2 == 0) "luzon" else if (i % 4 == 1) "visayas" else "mindanao"
      (f"0$i%08d", name, oldName, i % 3 == 0, f"1$prov%08d",
        "0", f"2${prov / 4}%08d", island, f"00$i%08d")
    }
    rows.toDF("code", "name", "oldName", "isCapital", "provinceCode",
      "districtCode", "regionCode", "islandGroupCode", "psgc10DigitCode")
  }

  private def provinces: DataFrame =
    (0 until nProvinces).map(p => (f"1$p%08d", f"Province$p%02d"))
      .toDF("code", "name")

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
