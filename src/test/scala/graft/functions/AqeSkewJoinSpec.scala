package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The OTHER skew tool next to salting (SURVEY.md §4 / builder brief:
  * "skewed keys → salting or AQE skew-join"): AQE's runtime re-plan
  * splits a skewed shuffle-join partition into subpartitions after
  * seeing the real sizes. Salting handles skewed AGGREGATION
  * ([[Skew.saltedAgg]], SkewSpec); AQE handles skewed JOINS without
  * touching the query — this spec demonstrates and pins that the split
  * actually triggers, so the claim in SCALE.md is executable, not
  * aspirational. Thresholds are lowered to fire at test scale (the
  * mechanism is identical at 100 TB with the defaults).
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the hot join partition at runtime (skew=true in the final plan)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // coalescing can merge away the small partitions and mask the
      // factor-vs-median comparison; keep partitions as planned
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying 200k rows vs 50 cold keys with 40 each
      val left = spark.range(0, 200000).select(lit(1L).as("k"), col("id").as("lv"))
        .union(spark.range(0, 2000).select((col("id") % 50 + 2).as("k"), col("id").as("lv")))
      val right = spark.range(0, 52).select(col("id").as("k"), col("id").as("rv"))
      val joined = left.join(right, "k")
      // AQE finalizes the plan during execution — and count() would spawn
      // a NEW QueryExecution; collect() runs THIS one, so its final plan
      // is the one inspected below
      assert(joined.collect().length === 202000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not split the hot partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
