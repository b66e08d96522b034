package graft.weather

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-gated queries over the reference's weather fact schema —
  * reference parity gets CORRECTNESS rows on weather-SHAPED data, not
  * only TPC-H-ish proxies.
  *
  * The driver's oracle (DuckDB) can only see the ten driver tables, so
  * [[fromEvents]] adapts `events` into the `weather_data` fact schema
  * (FIXTURES.md §1.3, `weather_data_fetcher.py:73-98`) with pure
  * deterministic column arithmetic — the SAME adapter is expressed in
  * the oracle SQL's `w` CTE, and the declared queries then run the real
  * [[WeatherAnalytics]] operators (the SURVEY §7.1 flagship and the
  * latest-per-location/top-k ranking window) unchanged on top of it.
  *
  * Scale notes: the adapter is a stateless projection (fuses into the
  * scan); r01 anchors its trailing window on max(data_datetime) via a
  * broadcast one-row cross join — no driver-side collect, and the
  * timestamp stays microsecond-exact in both engines.
  */
object WeatherQueries {

  /** `events` → `weather_data` schema: 146 locations (the reference's
    * city count), 30 provinces, temperature = the 2-decimal `value`.
    * Every derived column is integer/exact arithmetic, so both engines
    * agree bit-for-bit.
    */
  def fromEvents(events: DataFrame): DataFrame = {
    val loc = col("user_id") % 146
    events.select(
      col("event_id").as("weather_id"),
      loc.as("location_id"),
      concat(lit("L"), loc).as("location_name"),
      concat(lit("P"), loc % 30).as("province_name"),
      col("value").as("temperature_c"),
      (col("value") / 2).as("wind_speed_mps"),
      when(col("event_type") === "view", col("value")).otherwise(lit(0.0))
        .as("rain_1h_mm"),
      col("ts").as("data_datetime"))
  }

  /** The shared adapter, as the oracle's CTE. */
  private val W_CTE =
    """w AS (SELECT event_id AS weather_id, user_id % 146 AS location_id,
      |  'L' || CAST(user_id % 146 AS VARCHAR) AS location_name,
      |  'P' || CAST((user_id % 146) % 30 AS VARCHAR) AS province_name,
      |  value AS temperature_c, value / 2 AS wind_speed_mps,
      |  CASE WHEN event_type = 'view' THEN value ELSE 0.0 END AS rain_1h_mm,
      |  ts AS data_datetime FROM events)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SURVEY §7.1 flagship: avg temp per province over the trailing
    // 24 h, hottest first — WeatherAnalytics.avgTempPerProvince
    // anchored at the corpus max timestamp (broadcast scalar, exact μs)
    "r01_weather_avg_province" -> ((s, dir) => {
      val w = fromEvents(Tables(s, dir, "events"))
      val mx = w.agg(max(col("data_datetime")).as("mx"))
      // condition-less join, not crossJoin: the trailing-window filter
      // becomes the join condition after pushdown, so the plan is the
      // same Inner-with-predicate a SQL comma-join optimizes to
      // (SqlParitySpec pins the equality); the one-row side broadcasts
      WeatherAnalytics.avgTempPerProvince(
        w.join(broadcast(mx)),
        col("mx") - expr("INTERVAL 24 HOURS"))
    }),

    // latest observation per location (ranking window), top-10 hottest
    "r02_weather_topk_hottest" -> ((s, dir) =>
      WeatherAnalytics.topKHottest(fromEvents(Tables(s, dir, "events")), 10)),

    // rain accumulation per province over a fixed day
    "r03_weather_rain_province" -> ((s, dir) =>
      WeatherAnalytics.rainAccumulation(fromEvents(Tables(s, dir, "events")),
        lit("2024-01-02 00:00:00").cast("timestamp"),
        lit("2024-01-03 00:00:00").cast("timestamp"))),

    // hourly per-location series (tumbling epoch-aligned window ==
    // date_trunc in the oracle)
    "r04_weather_hourly" -> ((s, dir) =>
      WeatherAnalytics.hourlySeries(fromEvents(Tables(s, dir, "events")))
        .orderBy("hour_start", "location_id"))
  )

  def oracleSql: Map[String, String] = Map(
    "r01_weather_avg_province" ->
      s"""WITH $W_CTE,
         |m AS (SELECT max(data_datetime) AS mx FROM w)
         |SELECT province_name, round(avg(temperature_c), 4) AS avg_temp_c,
         |  count(*) AS n_obs
         |FROM w, m WHERE data_datetime >= mx - INTERVAL 24 HOUR
         |GROUP BY 1 ORDER BY avg_temp_c DESC, province_name""".stripMargin,

    "r02_weather_topk_hottest" ->
      s"""WITH $W_CTE,
         |r AS (SELECT *, row_number() OVER (PARTITION BY location_id
         |    ORDER BY data_datetime DESC, weather_id DESC) AS rn FROM w)
         |SELECT location_id, location_name, province_name, temperature_c,
         |  data_datetime
         |FROM r WHERE rn = 1
         |ORDER BY temperature_c DESC, location_id LIMIT 10""".stripMargin,

    "r03_weather_rain_province" ->
      s"""WITH $W_CTE
         |SELECT province_name,
         |  CAST(sum(CAST(rain_1h_mm AS DECIMAL(18,2))) AS DOUBLE) AS total_rain_mm,
         |  count(DISTINCT location_id) AS n_locations
         |FROM w WHERE data_datetime >= TIMESTAMP '2024-01-02 00:00:00'
         |  AND data_datetime < TIMESTAMP '2024-01-03 00:00:00'
         |GROUP BY 1 ORDER BY total_rain_mm DESC, province_name""".stripMargin,

    "r04_weather_hourly" ->
      s"""WITH $W_CTE
         |SELECT date_trunc('hour', data_datetime) AS hour_start, location_id,
         |  round(avg(temperature_c), 4) AS avg_temp_c,
         |  max(wind_speed_mps) AS max_wind_mps,
         |  CAST(sum(CAST(rain_1h_mm AS DECIMAL(18,2))) AS DOUBLE) AS rain_mm
         |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
