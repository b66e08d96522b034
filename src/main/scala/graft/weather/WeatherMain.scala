package graft.weather

import java.net.URLEncoder
import java.sql.Timestamp

import scala.util.Try

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Http, JsonSource, TableStore, Throttle}

/** The production front door — one runnable composition of the entire
  * reference lifecycle (`main`, `weather_data_fetcher.py:338-453`) over
  * the REAL connector stack, mirroring its stages in order:
  *
  *   ensure tables (K1, `:346`) →
  *   fetch cities + provinces (S1, `:349-350`) →
  *   merge + diff vs snapshot (J1/J2, `:355,:384-387`) →
  *   incremental-skip gate (F2, `:389-399`) →
  *   geocode changed rows, throttled (U1-U3, `:405-419`) →
  *   snapshot replace (K2/K3, `:426-430`) →
  *   weather fetch + shred + id lookup + append (S4/J3/K4, `:436-453`).
  *
  * Every seam is the library piece the jobs already expose —
  * [[graft.sources.Http]] for transport, [[graft.sources.JsonSource]]
  * for payload shredding, [[LocationRefresh.refresh]] /
  * [[WeatherIngest.ingest]] for the two pipelines,
  * [[graft.sources.TableStore]] for persistence — so this object is
  * pure composition plus the URL construction the reference hardcodes
  * (`:33-35,:137,:261`). Endpoints are configurable; tests run the
  * whole lifecycle against an in-process loopback HTTP server
  * (WeatherMainSpec), a deployment points the same config at the real
  * APIs.
  *
  * Throttling: the geocode resolver issues a variable number of calls
  * per row (one per name variant), so rate limiting sits INSIDE the
  * connector function via [[Throttle.acquire]] — a per-JVM token
  * bucket; cluster rate = perSec × executors (the reference's 1 req/s
  * serial sleep, `:419`, distributed). Fix-forwards carried over from
  * the jobs: only CHANGED rows geocode (the reference re-geocodes all
  * on any change, `:405`), and an empty cities feed with a non-empty
  * existing snapshot is treated as an outage — the refresh is skipped
  * instead of overwriting the snapshot with nothing (the reference
  * would wipe it, `:426`; error→empty must degrade, not destroy).
  */
object WeatherMain {

  /** Deployment configuration. Defaults mirror the reference's URL
    * shapes (`weather_data_fetcher.py:33-35,:137,:261`): geocode
    * `?q=<name>,<cc>&limit=5[&appid=<key>]`, weather
    * `?lat=<lat>&lon=<lon>&units=metric[&appid=<key>]`.
    */
  final case class Config(
      citiesUrl: String,
      provincesUrl: String,
      geocodeBase: String,
      weatherBase: String,
      snapshotPath: String,
      factsPath: String,
      apiKey: String = "",
      countryCode: String = "PH",
      geocodePerSec: Double = 1.0,
      weatherPerSec: Double = 60.0)

  /** What one run did — the reference's log lines as data. */
  final case class Report(
      refreshed: Boolean,
      locations: Long,
      resolved: Long,
      factsAppended: Long,
      missedLookups: Long)

  private lazy val mapper = new ObjectMapper()

  /** Geocode response array → candidates (`weather_data_fetcher.py:
    * 139-141`): executor-side parse (no SparkSession), malformed or
    * non-array payload → no candidates (error→empty, F4). Candidates
    * missing lat/lon are skipped; a present-but-null `state` stays
    * `None` — [[GeocodeMatcher.matchProvince]]'s branch 1 depends on
    * real absence.
    */
  def parseCandidates(body: String): Seq[GeoCandidate] =
    Try {
      val root = mapper.readTree(body)
      if (!root.isArray) Seq.empty[GeoCandidate]
      else (0 until root.size).flatMap { i =>
        val n = root.get(i)
        def num(f: String) = Option(n.get(f)).filter(_.isNumber).map(_.asDouble)
        def str(f: String) = Option(n.get(f)).filter(_.isTextual).map(_.asText)
        for (lat <- num("lat"); lon <- num("lon"))
          yield GeoCandidate(str("name").getOrElse(""), lat, lon,
            str("country").getOrElse(""), str("state"))
      }
    }.getOrElse(Seq.empty)

  /** The production geocode connector for [[LocationRefresh.refresh]]'s
    * seam: throttle → GET → parse. Serializable (captures only config
    * strings; Http/parse are static), so it runs on executors.
    */
  def geocoder(cfg: Config): String => Seq[GeoCandidate] = {
    val (base, cc, key, rate) = (cfg.geocodeBase, cfg.countryCode, cfg.apiKey, cfg.geocodePerSec)
    name => {
      Throttle.acquire(s"geocode@$base", rate)
      val q = URLEncoder.encode(s"$name,$cc", "UTF-8")
      val url = s"$base?q=$q&limit=5" + (if (key.nonEmpty) s"&appid=$key" else "")
      Http.getJson(url).map(parseCandidates).getOrElse(Seq.empty)
    }
  }

  /** The production weather connector for [[WeatherIngest.ingest]]'s
    * seam; null on any failure → the ingest drops the row (the
    * reference inserts only on 200, `:334-335`).
    */
  def weatherFetcher(cfg: Config): (Double, Double) => String = {
    val (base, key, rate) = (cfg.weatherBase, cfg.apiKey, cfg.weatherPerSec)
    (lat, lon) => {
      Throttle.acquire(s"weather@$base", rate)
      val url = s"$base?lat=$lat&lon=$lon&units=metric" + (if (key.nonEmpty) s"&appid=$key" else "")
      Http.getJson(url).orNull
    }
  }

  /** One full pipeline run (the reference's `main`). `now` is injected
    * for determinism, as in the jobs (SURVEY.md §7.4 #3).
    */
  def run(spark: SparkSession, cfg: Config,
      now: Timestamp = new Timestamp(System.currentTimeMillis())): Report = {
    // K1: idempotent ensure (`:346`). Facts are day-partitioned on
    // append (SURVEY.md §4), so only the snapshot gets an empty seed —
    // a pre-created unpartitioned empty table would conflict with the
    // partition directory layout the first append creates.
    TableStore.ensureTable(spark, cfg.snapshotPath, Schemas.locationsSnapshot)

    // S1: fetch both PSGC feeds (`:349-350`); outage → empty relation.
    val cities = JsonSource.fromPayload(spark,
      Http.getJson(cfg.citiesUrl), Schemas.psgcCities)
    val provinces = JsonSource.fromPayload(spark,
      Http.getJson(cfg.provincesUrl), Schemas.psgcProvinces)

    val old = TableStore.readSnapshot(spark, cfg.snapshotPath, Schemas.locationsSnapshot)
    val fresh = LocationRefresh.mergeCitiesProvinces(cities, provinces)

    // J2 + F2: refresh only when the compare columns changed
    // (`:383-399`) AND the feed actually delivered rows (outage guard —
    // fix-forward, see object doc).
    val feedUp = !cities.isEmpty
    val refreshed = feedUp &&
      LocationDiff.hasChanges(fresh, old, Schemas.compareColumns)
    if (refreshed) {
      val snap = LocationRefresh.refresh(spark, cities, provinces, old, geocoder(cfg))
      // K2/K3: full replace with dense ids reseeded over the stable key
      // — staging-swap because the refresh's carry-forward lineage
      // reads the path being replaced.
      TableStore.replaceSnapshot(snap.drop("location_id"), cfg.snapshotPath,
        "location_id", Seq("name", "province_name"))
    }

    // C: ingest weather over the (possibly refreshed) snapshot
    // (`:436-453`): fetch+shred on executors, broadcast id lookup,
    // IDENTITY-continuing weather_id, day-partitioned bulk append.
    val snapshot = TableStore.readSnapshot(spark, cfg.snapshotPath, Schemas.locationsSnapshot)
    val (facts, missed) = WeatherIngest.ingest(spark, snapshot, weatherFetcher(cfg), now)
    val baseId = TableStore.readSnapshot(spark, cfg.factsPath, Schemas.weatherData)
      .agg(coalesce(max(col("weather_id")), lit(0L))).head().getLong(0)
    // reference-scale id assignment (one window over a 146-row batch);
    // a fact-scale batch would use the overwriteSnapshotLarge pattern
    val ordered = facts.withColumn("weather_id",
      (row_number().over(Window.orderBy(col("location_name"), col("province_name")))
        .cast("long")) + lit(baseId))
      .select(Schemas.weatherData.fieldNames.map(col).toSeq: _*)
    TableStore.appendFacts(
      ordered.withColumn("day", to_date(col("data_datetime"))), cfg.factsPath, Seq("day"))

    Report(
      refreshed = refreshed,
      locations = snapshot.count(),
      resolved = snapshot.filter(col("latitude").isNotNull && col("longitude").isNotNull).count(),
      factsAppended = ordered.count(),
      missedLookups = missed.count())
  }
}
