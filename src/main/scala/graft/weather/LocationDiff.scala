package graft.weather

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change detection between a freshly-fetched locations frame and the
  * previous snapshot — the J2 operator (`weather_data_fetcher.py:384-387`):
  * a full-outer merge with indicator on the 10 compare columns, keeping
  * rows not in both.
  *
  * NULL SEMANTICS (SURVEY.md §7.4 hard-part #1): pandas merge matches
  * NaN == NaN on join keys — `oldName` is null for 143/146 rows in the
  * real snapshot, so plain `===` would flag every row as changed.
  * `exceptAll` compares rows null-safely, which is exactly the pandas
  * behavior; the two anti-directions together are the symmetric
  * difference the reference filters out of the indicator join.
  *
  * Scale: exceptAll plans as a hash anti-aggregation — one shuffle on all
  * compare columns, no row-by-row driver work. The empty-diff gate
  * (`:389,:399`) stays an application-level `isEmpty` on this result
  * (cheap: limit-1 scan after the aggregation).
  */
object LocationDiff {

  /** Rows of `fresh` not present in `old` plus rows of `old` not present
    * in `fresh` (on `cols`), tagged with a `side` indicator
    * ("left_only" / "right_only" — pandas' indicator vocabulary).
    */
  def symmetricDiff(fresh: DataFrame, old: DataFrame, cols: Seq[String]): DataFrame = {
    val f = fresh.select(cols.map(col): _*)
    val o = old.select(cols.map(col): _*)
    f.exceptAll(o).withColumn("side", lit("left_only"))
      .union(o.exceptAll(f).withColumn("side", lit("right_only")))
  }

  /** The incremental-skip gate (`weather_data_fetcher.py:383-399`). */
  def hasChanges(fresh: DataFrame, old: DataFrame, cols: Seq[String]): Boolean =
    !symmetricDiff(fresh, old, cols).isEmpty
}
