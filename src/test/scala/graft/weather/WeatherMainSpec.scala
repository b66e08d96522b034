package graft.weather

import java.net.{InetSocketAddress, URLDecoder}
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TableStore

/** GoldenPipelineSpec's lifecycle driven through the PRODUCTION front
  * door ([[WeatherMain.run]]) against an in-process loopback HTTP server
  * — real sockets end-to-end: PSGC feeds arrive as HTTP JSON, geocoding
  * goes connector → URL-encode → socket → JSON parse → matcher, weather
  * fetch round-trips lat/lon through query params, and persistence goes
  * through TableStore. The committed golden fixtures (146 locations,
  * FIXTURES.md §1.1) are served as payloads, so every assertion from the
  * in-process golden run must hold over the wire too — plus the
  * lifecycle-only behaviors: incremental skip (zero geocode requests on
  * an unchanged feed), IDENTITY-continuing weather_id across runs, and
  * the feed-outage guard.
  */
class WeatherMainSpec extends SparkSpec {

  import GoldenPipelineSpec.{fetch, nProvinces}

  private def golden(name: String): DataFrame =
    spark.read.parquet(getClass.getResource(s"/golden/$name.parquet").getPath)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  /** Raw-query parse with form-decoding ("+" = space, %xx) — the server
    * side of the connector's URLEncoder discipline.
    */
  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("")
      .split("&").filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def candidateJson(c: GeoCandidate): String = {
    val state = c.state.map(s => s""","state":"$s"""").getOrElse("")
    s"""{"name":"${c.name}","lat":${c.lat},"lon":${c.lon},"country":"${c.country}"$state}"""
  }

  test("full lifecycle over real sockets: refresh, geocode, ingest, append, skip, outage") {
    val citiesJson = golden("cities").toJSON.collect().mkString("[", ",", "]")
    val provincesJson = golden("provinces").toJSON.collect().mkString("[", ",", "]")
    val geoCalls = new AtomicInteger(0)
    val weatherCalls = new AtomicInteger(0)

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/cities", (ex: HttpExchange) => {
      respond(ex, 200, citiesJson); ex.close()
    })
    server.createContext("/provinces", (ex: HttpExchange) => {
      respond(ex, 200, provincesJson); ex.close()
    })
    server.createContext("/geo", (ex: HttpExchange) => {
      geoCalls.incrementAndGet()
      val name = queryParams(ex)("q").stripSuffix(",PH")
      respond(ex, 200,
        GoldenPipelineSpec.geocoder(name).map(candidateJson).mkString("[", ",", "]"))
      ex.close()
    })
    server.createContext("/weather", (ex: HttpExchange) => {
      weatherCalls.incrementAndGet()
      val p = queryParams(ex)
      respond(ex, 200, fetch(p("lat").toDouble, p("lon").toDouble))
      ex.close()
    })
    server.createContext("/down", (ex: HttpExchange) => {
      respond(ex, 404, "gone"); ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val dir = java.nio.file.Files.createTempDirectory("wmain").toString
      val cfg = WeatherMain.Config(
        citiesUrl = s"http://127.0.0.1:$port/cities",
        provincesUrl = s"http://127.0.0.1:$port/provinces",
        geocodeBase = s"http://127.0.0.1:$port/geo",
        weatherBase = s"http://127.0.0.1:$port/weather",
        snapshotPath = s"$dir/locations",
        factsPath = s"$dir/weather_facts",
        geocodePerSec = 10000, weatherPerSec = 10000)

      // ---- run 1: cold start — everything refreshes and ingests ----
      val r1 = WeatherMain.run(spark, cfg, Timestamp.valueOf("2024-12-20 12:00:00"))
      assert(r1.refreshed)
      assert(r1.locations === 146)
      assert(r1.resolved === 138)        // 8 Deltas never resolve
      assert(r1.factsAppended === 138)   // only resolved rows ingest
      assert(r1.missedLookups === 0)
      assert(weatherCalls.get() === 138) // one fetch per resolved row — no recompute double-spend
      val geoAfterFirst = geoCalls.get()
      assert(geoAfterFirst >= 146)       // every row geocoded at least once

      // snapshot invariants, through the wire (GoldenPipelineSpec parity)
      val snap = TableStore.readSnapshot(spark, cfg.snapshotPath, Schemas.locationsSnapshot)
      assert(snap.agg(min("location_id"), max("location_id"), countDistinct("location_id"))
        .head().toSeq === Seq(1L, 146L, 146L))
      assert(snap.filter(col("oldName").isNull).count() === 143)
      assert(snap.filter(col("name").startsWith("Delta") && col("latitude").isNotNull).isEmpty)
      assert(snap.filter(col("name").startsWith("Gamma")).filter(col("latitude").isNull).isEmpty)

      // fact invariants: dense IDENTITY ids, day partition, temp really
      // round-tripped lat through the socket (fetch derives temp = 20 + lat)
      val facts1 = spark.read.parquet(cfg.factsPath)
      assert(facts1.count() === 138)
      assert(facts1.agg(min("weather_id"), max("weather_id"), countDistinct("weather_id"))
        .head().toSeq === Seq(1L, 138L, 138L))
      assert(facts1.select("day").distinct().collect().map(_.get(0).toString).toSeq
        === Seq("2024-12-20"))
      val dim = snap.select(col("location_id"), col("latitude"))
      assert(facts1.join(dim, "location_id")
        .filter(col("temperature_c") =!= col("latitude") + 20.0).isEmpty)

      // per-province analytics shape survives the socket path
      assert(facts1.select("province_name").distinct().count() === nProvinces)

      // ---- run 2: unchanged feed — incremental skip, ids continue ----
      val r2 = WeatherMain.run(spark, cfg, Timestamp.valueOf("2024-12-21 12:00:00"))
      assert(!r2.refreshed)
      assert(geoCalls.get() === geoAfterFirst) // ZERO geocode requests on the wire
      assert(r2.factsAppended === 138)
      val facts2 = spark.read.parquet(cfg.factsPath)
      assert(facts2.count() === 276)
      assert(facts2.agg(max("weather_id"), countDistinct("weather_id"))
        .head().toSeq === Seq(276L, 276L))   // IDENTITY continues, no reuse
      // snapshot untouched by the skipped refresh: ids stable
      val snap2 = TableStore.readSnapshot(spark, cfg.snapshotPath, Schemas.locationsSnapshot)
      val a = snap.select("name", "province_name", "location_id", "latitude")
      val b = snap2.select("name", "province_name", "location_id", "latitude")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

      // ---- run 3: cities feed outage — snapshot survives, ingest continues ----
      val r3 = WeatherMain.run(spark, cfg.copy(citiesUrl = s"http://127.0.0.1:$port/down"),
        Timestamp.valueOf("2024-12-22 12:00:00"))
      assert(!r3.refreshed)
      assert(r3.locations === 146)       // outage did NOT wipe the snapshot
      assert(r3.factsAppended === 138)
      assert(spark.read.parquet(cfg.factsPath).count() === 414)
    } finally server.stop(0)
  }
}
