package graft.weather

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The analytics layer the reference's data model exists for but never
  * ships (SURVEY.md §2.6: `README.md:4,:23` promise analytics, no code
  * does) — declared over the WeatherData fact schema (§1.3 #6).
  *
  * Scale notes: the fact table is written partitioned by day (TableStore
  * appendFacts partitionBy), so the time-range filters here prune
  * partitions; all aggregates are hash aggregates with map-side partial
  * combine; latest-per-location is one ranking window partitioned by the
  * entity key (no global sort).
  */
object WeatherAnalytics {

  /** §7.1 flagship: average temperature per province over the trailing
    * window, hottest first.
    */
  def avgTempPerProvince(weather: DataFrame, since: Column): DataFrame =
    weather.filter(col("data_datetime") >= since)
      .groupBy(col("province_name"))
      .agg(
        round(avg(col("temperature_c")), 4).as("avg_temp_c"),
        count(lit(1)).as("n_obs"))
      .orderBy(col("avg_temp_c").desc, col("province_name"))

  /** Hourly time-bucketed series per location. Rain sums in exact
    * DECIMAL(18,2) (order-independent; see [[rainAccumulation]]); max
    * passes values through untouched.
    */
  def hourlySeries(weather: DataFrame): DataFrame =
    weather.groupBy(window(col("data_datetime"), "1 hour"), col("location_id"))
      .agg(
        round(avg(col("temperature_c")), 4).as("avg_temp_c"),
        max(col("wind_speed_mps")).as("max_wind_mps"),
        sum(col("rain_1h_mm").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("rain_mm"))
      .select(col("window.start").as("hour_start"), col("location_id"),
        col("avg_temp_c"), col("max_wind_mps"), col("rain_mm"))

  /** Latest observation per location (ranking window, §2.6). */
  def latestPerLocation(weather: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("location_id"))
      .orderBy(col("data_datetime").desc, col("weather_id").desc)
    weather.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Top-k hottest current readings (latest per location, then top-k). */
  def topKHottest(weather: DataFrame, k: Int): DataFrame =
    latestPerLocation(weather)
      .orderBy(col("temperature_c").desc, col("location_id"))
      .limit(k)
      .select("location_id", "location_name", "province_name",
        "temperature_c", "data_datetime")

  /** Rain accumulation per province over a time range. The sum runs in
    * exact DECIMAL(18,2) (readings are 2-decimal) so the result is
    * independent of partial-aggregation order — double folds differ in
    * the last ULP between aggregation trees; see Relational's class doc.
    */
  def rainAccumulation(weather: DataFrame, from: Column, until: Column): DataFrame =
    weather.filter(col("data_datetime") >= from && col("data_datetime") < until)
      .groupBy(col("province_name"))
      .agg(sum(col("rain_1h_mm").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_rain_mm"),
        countDistinct(col("location_id")).as("n_locations"))
      .orderBy(col("total_rain_mm").desc, col("province_name"))
}
