package graft.weather

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entry point C — weather ingestion (`weather_data_fetcher.py:436-453`,
  * traced in SURVEY.md §3.3): snapshot → filter non-null coords → fetch →
  * JSON shred (17 fields) → location_id resolution → append.
  *
  * The reference does all of this in a serial per-row loop with two DB
  * round trips per row (`:285,:296`); here it is two distributed stages:
  * (1) fetch+shred as a typed map over snapshot partitions, (2) one
  * broadcast equi-join against the locations dim to resolve location_id
  * (J3 — the per-row point SELECT `:286-293` becomes a shuffle-free
  * broadcast join; misses become a left_anti audit instead of a log line).
  *
  * `fetchJson: (lat, lon) => json` is the injected connector; a real one
  * wraps HTTP with per-partition throttling (`mapPartitions` + token
  * bucket), tests inject fixtures.
  */
object WeatherIngest {

  /** S4 shred (`weather_data_fetcher.py:267-281`) as pure Column logic
    * over a `raw` JSON string column. Defaults mirror P6: rain missing →
    * 0 (`:278`); deg/visibility/cloudiness missing → null (`:276-279`);
    * epoch seconds → UTC timestamps (C5 semantics note: reference is
    * local-naive `:280-281`, we pin UTC by session conf).
    */
  def shred(withRaw: DataFrame): DataFrame = {
    val j = from_json(col("raw"), Schemas.openWeatherResponse)
    withRaw
      .withColumn("w", j)
      .select(
        col("location_name"), col("province_name"),
        element_at(col("w.weather"), 1).getField("main").as("weather_main"),         // C9 (:267)
        element_at(col("w.weather"), 1).getField("description").as("weather_description"),
        col("w.main.temp").as("temperature_c"),
        col("w.main.feels_like").as("feels_like_c"),
        col("w.main.temp_min").as("temp_min_c"),
        col("w.main.temp_max").as("temp_max_c"),
        col("w.main.pressure").as("pressure_hpa"),
        col("w.main.humidity").as("humidity_percent"),
        col("w.wind.speed").as("wind_speed_mps"),
        col("w.wind.deg").as("wind_direction_deg"),                                  // default null (:276)
        col("w.visibility").as("visibility_m"),                                      // default null (:277)
        coalesce(col("w.rain.1h"), lit(0.0)).as("rain_1h_mm"),                       // default 0 (:278)
        col("w.clouds.all").as("cloudiness_percent"),                                // default null (:279)
        timestamp_seconds(col("w.sys.sunrise")).as("sunrise"),                       // C5 (:280)
        timestamp_seconds(col("w.sys.sunset")).as("sunset"))
  }

  /** Full ingest pass. Returns (facts ready to append, missed-lookup
    * audit). `now` is injected for determinism (SURVEY.md §7.4 #3).
    */
  def ingest(
      spark: SparkSession,
      snapshot: DataFrame,
      fetchJson: (Double, Double) => String,
      now: java.sql.Timestamp): (DataFrame, DataFrame) = {
    import spark.implicits._

    val coords = snapshot
      .filter(col("latitude").isNotNull && col("longitude").isNotNull) // F3 (:450)
      .select(col("name").as("location_name"), col("province_name"),
        col("latitude"), col("longitude"))

    val fetched = coords
      .as[(String, Option[String], Double, Double)]
      .map { case (name, prov, lat, lon) => (name, prov.orNull, fetchJson(lat, lon)) }
      .toDF("location_name", "province_name", "raw")
      // F4 on the fetch seam: a failed fetch (connector returns null)
      // produces NO fact row — the reference only inserts on HTTP 200
      // (`:334-335` logs the error and skips). Fixture connectors always
      // return a body, so this filter is a no-op in offline runs.
      .filter(col("raw").isNotNull)
      // Both outputs (facts, missed audit) consume this relation; persist
      // so the connector fires exactly once per row per pass no matter
      // how many outputs the caller evaluates — a lazy recompute would
      // double-spend the API quota. ContextCleaner unpersists it once
      // the frames are unreachable.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val shredded = shred(fetched)
      .withColumn("data_datetime", lit(now)) // ingestion time (:282)
      .withColumn("inserted_at", lit(now))   // GETDATE() default (:96)

    // J3: point lookup → broadcast equi-join on (location_name, province_name);
    // dim keys renamed so the joined schema stays duplicate-free
    val dim = snapshot.select(
      col("location_id"), col("name").as("dim_name"), col("province_name").as("dim_prov"))
    def cond(left: DataFrame) =
      left("location_name") === dim("dim_name") && left("province_name") <=> dim("dim_prov")
    val facts = shredded.join(broadcast(dim), cond(shredded), "inner")
      .drop("dim_name", "dim_prov")

    // the reference's log-on-miss (:292-293) as a left_anti audit relation
    val missed = shredded.join(broadcast(dim), cond(shredded), "left_anti")
      .select(col("location_name"), col("province_name"))

    (facts, missed)
  }
}
