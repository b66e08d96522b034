package graft.weather

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** §7.1 flagship + §2.6 declared queries over a deterministic in-test
  * weather fact fixture (FIXTURES.md §1.3 shape, reduced).
  */
class WeatherAnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private def t(h: Int): Timestamp = Timestamp.valueOf(f"2024-12-20 $h%02d:00:00")

  // (weather_id, location_id, location_name, province_name, temp, rain, wind, data_datetime)
  private def weather = Seq(
    (1L, 1L, "Manila", "Metro Manila", 30.0, 0.0, 2.0, t(1)),
    (2L, 1L, "Manila", "Metro Manila", 34.0, 1.5, 3.0, t(2)),
    (3L, 2L, "Quezon", "Metro Manila", 32.0, 0.5, 1.0, t(2)),
    (4L, 3L, "Cebu", "Cebu", 28.0, 4.0, 6.0, t(1)),
    (5L, 3L, "Cebu", "Cebu", 26.0, 2.0, 5.0, t(3)),
    (6L, 4L, "Baguio", "Benguet", 18.0, 0.0, 1.0, t(3)))
    .toDF("weather_id", "location_id", "location_name", "province_name",
      "temperature_c", "rain_1h_mm", "wind_speed_mps", "data_datetime")

  test("avg temperature per province, hottest first (§7.1 flagship)") {
    val got = WeatherAnalytics.avgTempPerProvince(weather, lit(t(0)))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("Metro Manila", 32.0, 3L), ("Cebu", 27.0, 2L), ("Benguet", 18.0, 1L)))
  }

  test("time filter prunes: since-cutoff drops older observations") {
    val got = WeatherAnalytics.avgTempPerProvince(weather, lit(t(2)))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === Seq(("Metro Manila", 33.0), ("Cebu", 26.0), ("Benguet", 18.0)))
  }

  test("latest per location picks max data_datetime, id tiebreak") {
    val got = WeatherAnalytics.latestPerLocation(weather)
      .select("location_id", "weather_id").orderBy("location_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L), (2L, 3L), (3L, 5L), (4L, 6L)))
  }

  test("top-k hottest over latest readings") {
    val got = WeatherAnalytics.topKHottest(weather, 2)
      .collect().map(r => (r.getString(1), r.getDouble(3)))
    assert(got.toSeq === Seq(("Manila", 34.0), ("Quezon", 32.0)))
  }

  test("hourly series buckets and aggregates") {
    val got = WeatherAnalytics.hourlySeries(weather)
      .filter(col("location_id") === 1L).orderBy("hour_start")
      .collect().map(r => (r.getTimestamp(0), r.getDouble(2), r.getDouble(4)))
    assert(got.toSeq === Seq((t(1), 30.0, 0.0), (t(2), 34.0, 1.5)))
  }

  test("rain accumulation per province in range") {
    val got = WeatherAnalytics.rainAccumulation(weather, lit(t(0)), lit(t(3)))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("Cebu", 4.0, 1L), ("Metro Manila", 2.0, 2L)))
  }

  test("streaming hourly series agrees with batch on closed windows (r04 twin)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String, String, Double, Double, Double, Timestamp)]
    def toWeather(df: org.apache.spark.sql.DataFrame) =
      df.toDF("weather_id", "location_id", "location_name", "province_name",
        "temperature_c", "rain_1h_mm", "wind_speed_mps", "data_datetime")
    val rows = weather.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getString(3), r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getTimestamp(7)))
    mem.addData(rows.toIndexedSeq)
    val q = WeatherStream.hourlySeriesStream(toWeather(mem.toDF()))
      .writeStream.format("memory").queryName("wh_hourly")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      // a late sentinel far past every fixture hour closes all windows
      mem.addData(Seq((99L, 9L, "X", "X", 0.0, 0.0, 0.0,
        Timestamp.valueOf("2024-12-21 12:00:00"))))
      q.processAllAvailable()
      val streamed = spark.sql(
        """SELECT hour_start, location_id, avg_temp_c, max_wind_mps, rain_mm
          |FROM wh_hourly WHERE location_id < 9 ORDER BY 1, 2""".stripMargin)
        .collect().map(_.toSeq).toSeq
      val batch = WeatherAnalytics.hourlySeries(weather)
        .orderBy("hour_start", "location_id").collect().map(_.toSeq).toSeq
      assert(streamed === batch)
    } finally q.stop()
  }
}
