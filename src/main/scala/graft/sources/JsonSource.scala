package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1 — external JSON payload → relation (`fetch_psgc_data`,
  * `weather_data_fetcher.py:40-48`): a connector fetches a JSON array of
  * objects, the engine parallelizes and shreds it against an explicit
  * schema. The reference's error contract — non-200 / malformed payload
  * → EMPTY frame, never a failure (`:47-48`) — is preserved: `None` or
  * an unparsable payload yields an empty relation with the declared
  * schema, so downstream joins/diffs degrade gracefully.
  *
  * Scale: one payload parallelized from the driver suits the reference's
  * ~150-row PSGC arrays; a 100 TB corpus of JSON documents instead goes
  * through `spark.read.schema(...).json(paths)` directly (same schema
  * constants, distributed scan) — both paths share the explicit-schema
  * discipline (SURVEY.md §1.2: inference only as an opt-in convenience).
  */
object JsonSource {

  /** Parse a fetched JSON-array payload into a typed relation;
    * None/invalid → empty relation with `schema`.
    */
  def fromPayload(spark: SparkSession, payload: Option[String], schema: StructType): DataFrame = {
    import spark.implicits._
    payload match {
      case None => empty(spark, schema)
      case Some(s) =>
        val ds: Dataset[String] = spark.createDataset(Seq(s))
        val parsed = spark.read.schema(schema)
          .option("mode", "DROPMALFORMED") // malformed rows → dropped, not failed
          .option("multiLine", true)       // payload is one JSON array document
          .json(ds)
        parsed
    }
  }

  def empty(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
}
