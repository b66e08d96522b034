package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Deterministic training-shard export — the last hop of the data
  * pipeline (after dedup/curation/packing, the corpus ships as N
  * shards that trainers stream).
  *
  * Shard assignment is CONTENT-ADDRESSED (portable hash of the key,
  * mod N — the t10 membership rule, not round-robin or RNG), so a
  * row's shard is stable across runs, cluster sizes, and engine
  * versions, and duplicate keys always co-locate. Rows sort by key
  * within each shard, so shard CONTENT (the row sequence) is
  * byte-for-byte reproducible — resumable training jobs and cache
  * layers depend on exactly this.
  *
  * Layout: `path/shard=K/` via partitionBy — shard dirs prune on read
  * (a trainer reading shard 3 scans 1/N of the files).
  */
object Shards {

  def writeShards(df: DataFrame, path: String, keyCol: String,
      nShards: Int = 8): Unit =
    df.withColumn("shard",
        pmod(Text.charFp(col(keyCol).cast("string")), lit(nShards.toLong)).cast("int"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** The shard a key lands in — for readers that want one shard
    * without scanning (mirror of the write-side assignment).
    */
  def shardOf(key: String, nShards: Int = 8): Int =
    (((Text.charFpStr(key) % nShards) + nShards) % nShards).toInt
}
