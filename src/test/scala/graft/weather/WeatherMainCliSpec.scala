package graft.weather

import java.net.{InetSocketAddress, URLDecoder}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The spark-submit entry ([[WeatherMain.main]]/cliRun) — arg parsing,
  * exit codes, cluster-rate resolution, and one `main(args)` lifecycle
  * against the loopback server (the reference's `__main__`,
  * `weather_data_fetcher.py:455-456`, as a runnable deployment).
  */
class WeatherMainCliSpec extends SparkSpec {

  import GoldenPipelineSpec.fetch

  private def golden(name: String): DataFrame =
    spark.read.parquet(getClass.getResource(s"/golden/$name.parquet").getPath)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def required(dir: String, port: Int): Array[String] = Array(
    "--cities-url", s"http://127.0.0.1:$port/cities",
    "--provinces-url", s"http://127.0.0.1:$port/provinces",
    "--geocode-base", s"http://127.0.0.1:$port/geo",
    "--weather-base", s"http://127.0.0.1:$port/weather",
    "--snapshot-path", s"$dir/locations",
    "--facts-path", s"$dir/weather_facts")

  test("parseConfig: required args, defaults, env key, every rejection branch") {
    val ok = WeatherMain.parseConfig(required("/tmp/x", 1), env = Map.empty)
    assert(ok.exists(c => c.countryCode == "PH" && c.geocodePerSec == 1.0 &&
      c.weatherPerSec == 60.0 && c.apiKey == "" &&
      c.geocodePerSecCluster.isEmpty && c.executorJvms.isEmpty))
    // env supplies the key when --api-key is absent; the flag wins
    assert(WeatherMain.parseConfig(required("/tmp/x", 1),
      env = Map("WEATHER_API_KEY" -> "k1")).exists(_.apiKey == "k1"))
    assert(WeatherMain.parseConfig(required("/tmp/x", 1) ++ Array("--api-key", "k2"),
      env = Map("WEATHER_API_KEY" -> "k1")).exists(_.apiKey == "k2"))
    // cluster budgets parse into the Option dials
    val cl = WeatherMain.parseConfig(required("/tmp/x", 1) ++
      Array("--geocode-per-sec-cluster", "1.0", "--executor-jvms", "100"), Map.empty)
    assert(cl.exists(c => c.geocodePerSecCluster.contains(1.0) &&
      c.executorJvms.contains(100)))
    // rejections all carry usage
    val bad = Seq(
      Array("positional"),                              // non-flag arg
      Array("--cities-url"),                            // missing value
      required("/tmp/x", 1) ++ Array("--nope", "v"),    // unknown flag
      required("/tmp/x", 1).drop(2),                    // missing required
      required("/tmp/x", 1) ++ Array("--geocode-per-sec", "fast"),
      // non-positive dials are usage errors (exit 2) up front, never a
      // later Throttle.perJvmShare require stack trace (ADVICE r11)
      required("/tmp/x", 1) ++ Array("--executor-jvms", "0"),
      required("/tmp/x", 1) ++ Array("--geocode-per-sec", "-1"),
      required("/tmp/x", 1) ++ Array("--weather-per-sec-cluster", "0"),
      // NaN fails d <= 0 (every compare is false) and Infinity parses —
      // both must still get the usage error, not a Throttle blowup
      // (ADVICE r12)
      required("/tmp/x", 1) ++ Array("--geocode-per-sec", "NaN"),
      required("/tmp/x", 1) ++ Array("--weather-per-sec", "Infinity"))
    bad.foreach { args =>
      val r = WeatherMain.parseConfig(args, Map.empty)
      assert(r.isLeft && r.left.exists(_.contains("usage:")), args.mkString(" "))
    }
  }

  test("resolveRates: cluster budget / executor JVMs; per-JVM rates untouched otherwise") {
    val base = WeatherMain.Config("c", "p", "g", "w", "s", "f")
    // explicit divisor: 1 req/s over 100 JVMs -> 0.01/s each
    val r = WeatherMain.resolveRates(spark, base.copy(
      geocodePerSecCluster = Some(1.0), weatherPerSecCluster = Some(60.0),
      executorJvms = Some(100)))
    assert(r.geocodePerSec === 0.01 && r.weatherPerSec === 0.6)
    // no cluster budget: config passes through bit-identical
    assert(WeatherMain.resolveRates(spark, base) === base)
    // auto-detect in local mode: one live JVM -> share == budget
    val auto = WeatherMain.resolveRates(spark,
      base.copy(geocodePerSecCluster = Some(5.0)))
    assert(auto.geocodePerSec === 5.0)
  }

  test("main(args) runs the lifecycle end-to-end; cliRun exit codes 1/2 on failure") {
    val citiesJson = golden("cities").toJSON.collect().mkString("[", ",", "]")
    val provincesJson = golden("provinces").toJSON.collect().mkString("[", ",", "]")
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/cities", (ex: HttpExchange) => {
      respond(ex, 200, citiesJson); ex.close()
    })
    server.createContext("/provinces", (ex: HttpExchange) => {
      respond(ex, 200, provincesJson); ex.close()
    })
    server.createContext("/geo", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").find(_.startsWith("q=")).map(_.drop(2)).getOrElse("")
      val name = URLDecoder.decode(q, "UTF-8").stripSuffix(",PH")
      val cands = GoldenPipelineSpec.geocoder(name).map { c =>
        val state = c.state.map(s => s""","state":"$s"""").getOrElse("")
        s"""{"name":"${c.name}","lat":${c.lat},"lon":${c.lon},"country":"${c.country}"$state}"""
      }
      respond(ex, 200, cands.mkString("[", ",", "]")); ex.close()
    })
    server.createContext("/weather", (ex: HttpExchange) => {
      val p = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
      respond(ex, 200, fetch(p("lat").toDouble, p("lon").toDouble)); ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val dir = java.nio.file.Files.createTempDirectory("wcli").toString
      val args = required(dir, port) ++
        Array("--geocode-per-sec", "10000", "--weather-per-sec", "10000")
      // the REAL entry: exit-0 path returns without sys.exit
      WeatherMain.main(args)
      val facts = spark.read.parquet(s"$dir/weather_facts")
      assert(facts.count() === 138)
      assert(facts.select("location_id").distinct().count() === 138)
      // run failure (unwritable table path) -> exit code 1
      assert(WeatherMain.cliRun(required("/dev/null/nope", port) ++
        Array("--geocode-per-sec", "10000", "--weather-per-sec", "10000")) === 1)
      // usage failure -> exit code 2
      assert(WeatherMain.cliRun(Array("--cities-url")) === 2)
    } finally server.stop(0)
  }
}
