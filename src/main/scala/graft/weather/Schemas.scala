package graft.weather

import org.apache.spark.sql.types._

/** Explicit StructTypes for the weather domain (SURVEY.md §1.3). The
  * reference infers schemas from JSON/pandas (`weather_data_fetcher.py:45`);
  * here every relation has a fixed, documented schema — inference is never
  * relied on.
  *
  * PSGC codes stay strings: leading zeros are significant (e.g.
  * `012805000`), see SURVEY.md §1.2.
  */
object Schemas {

  /** psgc_cities — https://psgc.gitlab.io/api/cities.json shape
    * (`weather_data_fetcher.py:32`, columns per `:377-380`).
    */
  val psgcCities: StructType = StructType(Seq(
    StructField("code", StringType),
    StructField("name", StringType, nullable = false),
    StructField("oldName", StringType),
    StructField("isCapital", BooleanType),
    StructField("provinceCode", StringType),
    StructField("districtCode", StringType),
    StructField("regionCode", StringType),
    StructField("islandGroupCode", StringType),
    StructField("psgc10DigitCode", StringType)))

  /** psgc_provinces (`weather_data_fetcher.py:33`); only code + name are
    * ever projected (`:355`).
    */
  val psgcProvinces: StructType = StructType(Seq(
    StructField("code", StringType),
    StructField("name", StringType, nullable = false),
    StructField("regionCode", StringType),
    StructField("islandGroupCode", StringType),
    StructField("psgc10DigitCode", StringType)))

  /** One element of the geocode API array (`weather_data_fetcher.py:173-177`). */
  val geocodeCandidate: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("country", StringType),
    StructField("state", StringType)))

  /** OpenWeather current-conditions response, the fields the reference
    * shreds (`weather_data_fetcher.py:264-281`).
    */
  val openWeatherResponse: StructType = StructType(Seq(
    StructField("weather", ArrayType(StructType(Seq(
      StructField("main", StringType),
      StructField("description", StringType))))),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType),
      StructField("feels_like", DoubleType),
      StructField("temp_min", DoubleType),
      StructField("temp_max", DoubleType),
      StructField("pressure", IntegerType),
      StructField("humidity", IntegerType)))),
    StructField("wind", StructType(Seq(
      StructField("speed", DoubleType),
      StructField("deg", IntegerType)))),
    StructField("visibility", IntegerType),
    StructField("rain", StructType(Seq(StructField("1h", DoubleType)))),
    StructField("clouds", StructType(Seq(StructField("all", IntegerType)))),
    StructField("sys", StructType(Seq(
      StructField("sunrise", LongType),
      StructField("sunset", LongType))))))

  /** dbo.Locations (`weather_data_fetcher.py:60-70`). */
  val locations: StructType = StructType(Seq(
    StructField("location_id", LongType, nullable = false),
    StructField("location_name", StringType, nullable = false),
    StructField("province_name", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("inserted_at", TimestampType)))

  /** dbo.WeatherData (`weather_data_fetcher.py:73-98`). */
  val weatherData: StructType = StructType(Seq(
    StructField("weather_id", LongType, nullable = false),
    StructField("location_id", LongType, nullable = false),
    StructField("location_name", StringType),
    StructField("province_name", StringType),
    StructField("weather_main", StringType),
    StructField("weather_description", StringType),
    StructField("temperature_c", DoubleType),
    StructField("feels_like_c", DoubleType),
    StructField("temp_min_c", DoubleType),
    StructField("temp_max_c", DoubleType),
    StructField("pressure_hpa", IntegerType),
    StructField("humidity_percent", IntegerType),
    StructField("wind_speed_mps", DoubleType),
    StructField("wind_direction_deg", IntegerType),
    StructField("visibility_m", IntegerType),
    StructField("rain_1h_mm", DoubleType),
    StructField("cloudiness_percent", IntegerType),
    StructField("sunrise", TimestampType),
    StructField("sunset", TimestampType),
    StructField("data_datetime", TimestampType),
    StructField("inserted_at", TimestampType)))

  /** The persisted locations snapshot (`all_locations.xlsx`,
    * `weather_data_fetcher.py:36,:426`): the 10 compare columns in
    * [[compareColumns]] order, then coordinates, then the dense id —
    * exactly the column order [[LocationRefresh.refresh]] emits.
    */
  val locationsSnapshot: StructType = StructType(
    psgcCities.fields.toSeq ++ Seq(
      StructField("province_name", StringType),
      StructField("latitude", DoubleType),
      StructField("longitude", DoubleType),
      StructField("location_id", LongType)))

  /** The 10 change-detection compare columns (`weather_data_fetcher.py:377-380`). */
  val compareColumns: Seq[String] = Seq(
    "code", "name", "oldName", "isCapital", "provinceCode", "districtCode",
    "regionCode", "islandGroupCode", "psgc10DigitCode", "province_name")
}
