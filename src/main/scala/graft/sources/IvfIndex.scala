package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index layout — the ANN scale path that
  * [[graft.queries.Similarity]] v02 computes inline at query time.
  *
  * The centroid-assignment relation is written `partitionBy("c_id")`,
  * one directory per centroid, so a probe of `nprobe` centroids reads
  * exactly `nprobe / nlist` of the files: static partition pruning at
  * the directory level, visible as `PartitionFilters` in the scan plan
  * and proven at execution level by `IvfIndexSpec` (every file a probe
  * touches lives under a probed `c_id=` directory).
  *
  * `partitionBy`, not `bucketBy`, deliberately: a probe's win is
  * PRUNING (read less), not shuffle co-location; `nlist` is modest
  * (16–4096) so one directory per centroid stays healthy at any data
  * scale — each directory just holds more files — and `bucketBy` would
  * additionally require a metastore table. At 100 TB, rebuilding the
  * index is one shuffle-free `partitionBy` write of the assignment
  * relation; incremental adds append into the matching directories.
  */
object IvfIndex {

  /** Persist an assignment relation (must carry a `c_id` column). */
  def write(assign: DataFrame, path: String): Unit =
    assign.write.mode("overwrite").partitionBy("c_id").parquet(path)

  /** Read only the probed centroids' partitions. */
  def probe(spark: SparkSession, path: String, centroidIds: Seq[Long]): DataFrame =
    spark.read.parquet(path).filter(col("c_id").isin(centroidIds: _*))
}
