package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-located joins: same-bucketed tables must join with NO
  * shuffle exchange on either side, and bucket pruning must reach the
  * scan — the write-once/join-many layout for recurring fact⋈fact
  * joins at scale.
  */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Drop the table AND its warehouse location — a leftover location
    * from a previous test JVM fails saveAsTable even after the
    * in-memory catalog forgot the table.
    */
  private def reset(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
  }

  test("same-bucketed tables sort-merge join with zero shuffle exchanges") {
    reset("orders_bkt"); reset("customer_bkt")
    Bucketing.writeBucketed(
      graft.Tables(spark, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_bkt", "o_custkey", buckets = 8)
    Bucketing.writeBucketed(
      graft.Tables(spark, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
      "customer_bkt", "o_custkey", buckets = 8)
    val joined = Bucketing.colocatedJoin(spark, "orders_bkt", "customer_bkt", "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$plan")
    // and the join is correct
    val expected = graft.Tables(spark, dir, "orders")
      .join(graft.Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey")).count()
    assert(joined.count() === expected)
  }

  test("equality predicate on the bucket key prunes to a single bucket") {
    // filter-only queries read un-bucketed under autoBucketedScan (no
    // join to co-locate for) — pin the bucketed scan to show pruning
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val one = spark.table("orders_bkt").filter(col("o_custkey") === 7L)
      val plan = one.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan)
    } finally
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
  }
}
