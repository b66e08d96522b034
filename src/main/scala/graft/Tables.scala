package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver fixtures (`TESTDATA.md`).
  *
  * At 100 TB each of these would be a partitioned/bucketed table; the scan
  * stays a plain `spark.read.parquet` so Catalyst's filter pushdown and
  * column pruning apply unchanged (verified per-query in the specs via
  * `explain`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read nanos as long, truncate to micros — exactly
      // what DuckDB does when loading ns into its us-precision TIMESTAMP,
      // so oracle comparisons stay exact.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
