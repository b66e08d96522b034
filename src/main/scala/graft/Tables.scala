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
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
      // Spark's vectorized reader rejects — read nanos as long, truncate
      // to micros, exactly what DuckDB does when loading ns into its
      // us-precision TIMESTAMP) and plain timestamp[us]. Branch on the
      // schema actually observed so either fixture generation works.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // timestamp[us] without UTC adjustment reads as TIMESTAMP_NTZ,
          // which watermarks reject. All sessions here run in UTC, so the
          // cast is value-preserving and matches DuckDB's naive reading.
          df.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
