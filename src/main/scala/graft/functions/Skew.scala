package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §4 partitioning row; builder brief:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE (on by default in Spark 4) splits skewed SHUFFLE partitions for
  * joins, but a single hot GROUP BY key still funnels every row of that
  * key through one reducer for the final merge. [[saltedAgg]] is the
  * classic two-phase shape: salt the key with `nSalts` buckets, partial
  * aggregate on (key, salt) — spreading the hot key over `nSalts`
  * reducers — then merge the partials per key. Correct for any algebraic
  * aggregate (sum/count/min/max expressible as partial + merge).
  */
object Skew {

  /** Two-phase salted aggregation.
    *
    * @param df      input
    * @param key     grouping key column name
    * @param aggs    (partialExpr, mergeExpr, outName): phase-1 aggregate
    *                over (key, salt) aliased to outName, phase-2 merge of
    *                the partials per key, again aliased outName
    * @param nSalts  salt fan-out for the hot keys
    */
  def saltedAgg(
      df: DataFrame,
      key: String,
      aggs: Seq[(Column, Column => Column, String)],
      nSalts: Int = 16): DataFrame = {
    // salt = hash of the whole row, mod nSalts: varies WITHIN a hot key
    // (hashing only the key would put the entire hot key in one bucket),
    // is deterministic, codegen'd, adds no shuffle, and keeps
    // monotonically_increasing_id out of the engine entirely (MID values
    // depend on the partition layout). The salt never appears in the
    // result, so only spread matters; exact-duplicate rows sharing a
    // bucket is fine — partial aggregation collapses them anyway.
    val salted = df.withColumn("__salt", pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(nSalts)))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(aggs.head._1.as(aggs.head._3),
        aggs.tail.map { case (p, _, n) => p.as(n) }: _*)
    partial.groupBy(col(key))
      .agg(aggs.head._2(col(aggs.head._3)).as(aggs.head._3),
        aggs.tail.map { case (_, m, n) => m(col(n)).as(n) }: _*)
  }
}
