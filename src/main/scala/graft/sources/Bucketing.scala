package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table layout for co-located joins — the third co-location
  * tool next to broadcast (small dims) and pre-partitioning: persist
  * both fact tables bucketed on the join key with the SAME bucket
  * count, and every subsequent equi-join on that key reads both sides
  * pre-partitioned and pre-sorted — a SortMergeJoin with NO shuffle
  * exchange on either side (asserted in BucketedJoinSpec). At 100 TB
  * this converts the recurring fact⋈fact shuffle (the dominant cost of
  * repeated joins on the same key) into a one-time write-side cost.
  *
  * Buckets also prune: an equality predicate on the bucket key scans
  * 1/buckets of the files (`SelectedBucketsCount` in the scan node).
  */
object Bucketing {

  /** Persist `df` bucketed + sorted on `key` (same bucket count on
    * both sides of an intended join). Bucketed layouts require the
    * table catalog (`saveAsTable`) — plain path writes don't record
    * bucket metadata.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    // repartition on the bucket key first (r20, optimization guide §6 —
    // the Iceberg write.distribution-mode=hash story): bucket id and
    // repartition both hash with Murmur3, so each bucket's rows land in
    // exactly one write task → ONE well-formed file per bucket at any
    // input partitioning. Without it every input partition opens a
    // writer per bucket it touches (input-partitions × buckets tiny
    // files), which both bloats the scan and forfeits the claimed
    // per-bucket sort (Spark only claims sortedness for single-file
    // buckets).
    df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket key. The merge
    * hint pins SortMergeJoin (a broadcast would hide the property being
    * relied on); with matching bucket counts Catalyst plans it with
    * zero Exchange nodes.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).hint("merge")
      .join(spark.table(right).hint("merge"), key)
}
