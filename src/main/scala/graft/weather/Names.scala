package graft.weather

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** City-name normalization (reference `weather_data_fetcher.py:121-124,
  * :145-157`). Provided both as pure Scala (for the geocode resolver and
  * its tests) and as Column expressions (for use inside query plans).
  */
object Names {

  /** Prefixes stripped by `normalize_city_name` (`weather_data_fetcher.py:147`). */
  val commonPrefixes: Seq[String] =
    Seq("City of ", "Municipality of ", "Barangay ", "Town of ")

  /** Remove the first matching common prefix, then trim
    * (`weather_data_fetcher.py:145-157`). The reference uses
    * `replace(prefix, '', 1)` guarded by `startswith`, so an anchored
    * strip is semantically identical.
    */
  def normalizeCityName(name: String): String =
    commonPrefixes.find(name.startsWith)
      .map(p => name.substring(p.length).trim)
      .getOrElse(name)

  /** `" City"` suffix fallback (`weather_data_fetcher.py:121-124`). */
  def stripCitySuffix(name: String): Option[String] =
    if (name.endsWith(" City")) Some(name.dropRight(5).trim) else None

  /** The geocode fallback chain's query variants, in try-order
    * (`weather_data_fetcher.py:104-130`): normalized, original, then
    * `" City"`-stripped. Distinct preserving order — the reference would
    * re-query the API for identical strings; skipping those is a
    * capability-preserving improvement (SURVEY.md §2.10 note).
    */
  def nameVariants(name: String): Seq[String] =
    (Seq(normalizeCityName(name), name) ++ stripCitySuffix(name)).distinct

  /** Column form of [[normalizeCityName]] — anchored regexp strip; trim
    * only applies after an actual strip (the reference returns the name
    * untouched when no prefix matches, `:157`).
    */
  def normalizeCityNameCol(c: Column): Column = {
    val stripped = regexp_replace(c, "^(City of |Municipality of |Barangay |Town of )", "")
    when(stripped =!= c, trim(stripped)).otherwise(c)
  }

  /** Column form of [[stripCitySuffix]]; passes through when no suffix. */
  def stripCitySuffixCol(c: Column): Column =
    when(c.endsWith(" City"), trim(c.substr(lit(1), length(c) - 5))).otherwise(c)
}
