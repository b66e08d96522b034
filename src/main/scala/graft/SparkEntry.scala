package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{Curation, Dedup, Pipeline, Relational, Similarity, Temporal, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * SURVEY.md §7.1 analogue ("average X per dim over a window, hottest
    * first") on the driver tables: revenue per region for 1995, largest
    * first. Exercises scan → broadcast dim joins → fact filter → hash agg
    * → sort, the skeleton every other query plugs into.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables(spark, dir, "lineitem")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val cust = Tables(spark, dir, "customer")
    val nat = Tables(spark, dir, "nation")
    val reg = Tables(spark, dir, "region")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("r_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Dedup.queries ++ TextAnalysis.queries ++ Similarity.queries ++
      Temporal.queries ++ Pipeline.queries ++ Curation.queries ++
      graft.multimodal.Multimodal.queries ++ graft.weather.WeatherQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every query has an oracle — the keysets
    * are identical (EntryContractSpec pins this structurally); an
    * omitted entry would get only a weaker rows-only check, and none
    * are omitted.
    */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ Dedup.oracleSql ++ TextAnalysis.oracleSql ++ Similarity.oracleSql ++
      Temporal.oracleSql ++ Pipeline.oracleSql ++ Curation.oracleSql ++
      graft.multimodal.Multimodal.oracleSql ++ graft.weather.WeatherQueries.oracleSql
}
