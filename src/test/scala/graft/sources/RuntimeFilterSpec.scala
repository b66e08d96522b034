package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime bloom-filter injection — the third scan-reduction tool next
  * to static pushdown (PlanSpec q05) and partition/bucket pruning
  * (IvfIndexSpec / BucketedJoinSpec): for a shuffle join whose build
  * side is made small by a selective filter, Catalyst injects a bloom
  * filter of the build-side keys into the probe-side SCAN, so the big
  * fact table drops non-joining rows before the shuffle. At 100 TB
  * this is the difference between shuffling all of lineitem and
  * shuffling only the rows that can possibly match a filtered orders
  * subset. Thresholds lowered to fire at fixture scale.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("a selective fact⋈fact join injects a bloom filter into the probe scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fixture scans are far below the 10 GB production default
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val ord = graft.Tables(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 200000)
        .select("o_orderkey", "o_totalprice")
      val li = graft.Tables(spark, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter reached the probe side:\n$plan")
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilter"),
        s"no bloom filter built from the filtered side:\n$plan")
      // and it's semantics-neutral: same count with the filter disabled
      val n = j.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(n === expected)
      assert(n > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
