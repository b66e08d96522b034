package graft.weather

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven coverage of every match_province branch
  * (`weather_data_fetcher.py:159-218`) — SURVEY.md §5 item 1.
  */
class GeocodeMatcherSpec extends AnyFunSuite {
  import GeocodeMatcher._

  private def cand(lat: Double, lon: Double, state: Option[String]) =
    GeoCandidate("x", lat, lon, "PH", state)

  test("null state accepts unconditionally (:176-180)") {
    assert(matchProvince(Seq(cand(1, 2, None)), Some("Cebu"), "Cebu City")
      === Some((1.0, 2.0)))
  }

  test("Isabela/Basilan hardcoded override, substring on state (:183-187)") {
    assert(matchProvince(Seq(cand(6.7, 121.97, Some("Province of Basilan"))),
      Some("Isabela"), "Isabela") === Some((6.7, 121.97)))
    // only fires when the QUERIED name is isabela
    assert(matchProvince(Seq(cand(6.7, 121.97, Some("Basilan"))),
      Some("Zamboanga"), "Lamitan") === None)
  }

  test("exact case-insensitive state==province (:193-196)") {
    assert(matchProvince(Seq(cand(10, 123, Some("CEBU"))), Some("cebu"), "Toledo")
      === Some((10.0, 123.0)))
  }

  test("substring province ⊂ state (:199-203)") {
    assert(matchProvince(Seq(cand(14, 121, Some("Province of Laguna"))),
      Some("Laguna"), "Calamba") === Some((14.0, 121.0)))
    // direction matters: state ⊂ province must NOT match
    assert(matchProvince(Seq(cand(14, 121, Some("Laguna"))),
      Some("Province of Laguna"), "Calamba") === None)
  }

  test("Naga/Camarines Sur with empty or literal-'nan' state (:206-210)") {
    assert(matchProvince(Seq(cand(13.6, 123.2, Some("nan"))),
      Some("Camarines Sur"), "Naga") === Some((13.6, 123.2)))
    assert(matchProvince(Seq(cand(13.6, 123.2, Some(""))),
      Some("camarines sur"), "naga") === Some((13.6, 123.2)))
    assert(matchProvince(Seq(cand(13.6, 123.2, Some("nan"))),
      Some("Camarines Sur"), "Pili") === None)
  }

  test("province absent: reference only logs, scans on, returns None (:211-212)") {
    assert(matchProvince(Seq(cand(1, 2, Some("Some State"))), None, "City") === None)
    // but a later null-state candidate still wins
    assert(matchProvince(Seq(cand(1, 2, Some("Some State")), cand(3, 4, None)),
      None, "City") === Some((3.0, 4.0)))
  }

  test("first-match order dependence (:172)") {
    val cs = Seq(cand(1, 1, Some("Cebu")), cand(2, 2, Some("Cebu")))
    assert(matchProvince(cs, Some("Cebu"), "Toledo") === Some((1.0, 1.0)))
  }

  test("empty candidates / null name return None (:166-170)") {
    assert(matchProvince(Nil, Some("Cebu"), "Toledo") === None)
    assert(matchProvince(Seq(cand(1, 2, None)), Some("Cebu"), null) === None)
  }

  test("resolve walks the variant chain in order (:104-130)") {
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    val geocoder: String => Seq[GeoCandidate] = { q =>
      calls += q
      if (q == "Quezon") Seq(cand(14.6, 121.0, Some("Metro Manila"))) else Nil
    }
    val r = resolve("Quezon City", Some("Metro Manila"), geocoder)
    assert(r === Some((14.6, 121.0)))
    // normalized ("Quezon City" unprefixed) tried first, then original
    // (identical, deduped), then " City"-stripped which hits
    assert(calls.toSeq === Seq("Quezon City", "Quezon"))
  }

  test("resolve strips 'City of ' prefix first (:108-113)") {
    val geocoder: String => Seq[GeoCandidate] = {
      case "Manila" => Seq(cand(14.59, 120.98, Some("Metro Manila")))
      case _        => Nil
    }
    assert(resolve("City of Manila", Some("Metro Manila"), geocoder)
      === Some((14.59, 120.98)))
  }
}
