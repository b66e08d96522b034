package graft.weather

/** One candidate from the geocode API (`weather_data_fetcher.py:173-177`).
  * `state` is Option — the reference sees Python None/NaN; we model real
  * absence (SURVEY.md §7.4 hard-part #1: no stringified-NaN).
  */
case class GeoCandidate(
    name: String, lat: Double, lon: Double, country: String, state: Option[String])

/** The fuzzy province matcher — behavioral port of `match_province`
  * (`weather_data_fetcher.py:159-218`), the only genuinely custom compute
  * in the reference (SURVEY.md §2.8). First-match over the candidate list
  * IN ORDER (order-dependence is load-bearing; candidates stay Seq).
  *
  * Branches, in reference order per candidate:
  *   1. state absent → accept unconditionally (`:176-180`)
  *   2. queried city "isabela" and "basilan" ⊆ state → accept (`:183-187`)
  *   3. exact state == province, case-insensitive (`:193-196`)
  *   4. substring: province ⊆ state, case-insensitive (`:199-203`)
  *   5. Naga/Camarines-Sur with state in {"", "nan"} (`:206-210`) — the
  *      literal "nan" arises from pandas astype(str) upstream (`:362`);
  *      kept as a literal match on the string value for behavior parity.
  *   6. province not a string (None/NaN) → the reference only LOGS
  *      (`:211-212` has no return) and scans on; we do the same. Note
  *      SURVEY.md §2.8 misread this as an accept — the code disagrees,
  *      and the code wins.
  *
  * Pure function + exhaustive unit tests, not a Catalyst Expression: the
  * logic is order-dependent branching over a tiny per-row candidate list,
  * so an Expression buys no vectorization win (SURVEY.md §2.8 verdict).
  */
object GeocodeMatcher {

  /** First-match scan; `queriedName` is the name variant being tried
    * (`fetch_coordinates` passes its own query string, `:140`).
    */
  def matchProvince(
      candidates: Seq[GeoCandidate],
      provinceName: Option[String],
      queriedName: String): Option[(Double, Double)] = {
    if (queriedName == null) return None
    val qLower = queriedName.toLowerCase
    candidates.iterator.flatMap { c =>
      c.state match {
        case None => Some((c.lat, c.lon))
        case Some(st) if qLower == "isabela" && st.toLowerCase.contains("basilan") =>
          Some((c.lat, c.lon))
        case Some(st) =>
          provinceName match {
            case Some(p) if st.equalsIgnoreCase(p) => Some((c.lat, c.lon))
            case Some(p) if st.toLowerCase.contains(p.toLowerCase) => Some((c.lat, c.lon))
            case Some(p) if qLower == "naga" && (st == "nan" || st.isEmpty) &&
              p.equalsIgnoreCase("camarines sur") => Some((c.lat, c.lon))
            case _ => None // includes province-absent: reference logs, never accepts (:211-212)
          }
      }
    }.nextOption()
  }

  /** The full fallback-chain resolver (`get_geocode`,
    * `weather_data_fetcher.py:104-130`): try each name variant against an
    * injected geocoder until one yields a match. `geocode` abstracts the
    * HTTP call (`fetch_coordinates` `:132-143`) so jobs and tests inject
    * fixtures; a real connector would throttle here (`:419`).
    */
  def resolve(
      cityName: String,
      provinceName: Option[String],
      geocode: String => Seq[GeoCandidate]): Option[(Double, Double)] =
    Names.nameVariants(cityName).iterator
      .flatMap(v => matchProvince(geocode(v), provinceName, v))
      .nextOption()
}
