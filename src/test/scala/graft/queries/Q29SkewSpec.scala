package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew robustness of the ONE shuffle join a 100 TB q29 run pays:
  * lineitem⋈orders on the fact key. AqeSkewJoinSpec pins the AQE
  * split mechanism on a synthetic join; this spec pins it on the
  * ACTUAL q29 plan shape — a fixture where one hot orderkey carries
  * ~200k lineitem rows (every other key a handful), thresholds
  * lowered to fire at test scale, asserting (a) the final adaptive
  * plan marks the fact join skewed/split and (b) the split run's
  * result equals the unsplit run's — the re-plan is a pure physical
  * rewrite.
  */
class Q29SkewSpec extends SparkSpec {

  private def copyTable(src: String, dir: String, t: String): Unit =
    spark.read.parquet(s"$src/$t.parquet").write.parquet(s"$dir/$t.parquet")

  /** sf0.001 with lineitem salted: one orderkey that SURVIVES q29's
    * orders-side filters (so the hot rows flow through the whole join
    * tree) replicated to ~200k rows.
    */
  private lazy val skewDir: String = {
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("q29skew").toString
    Seq("region", "nation", "customer", "supplier", "orders")
      .foreach(copyTable(src, dir, _))
    val hot = spark.read.parquet(s"$src/orders.parquet")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp") &&
        col("o_orderstatus") =!= "P")
      .select("o_orderkey").limit(1).collect().head.getLong(0)
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val hotRows = li.filter(col("l_orderkey") === hot).limit(1)
      .crossJoin(spark.range(200000).select(col("id"))).drop("id")
    li.union(hotRows).write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("AQE splits the hot lineitem⋈orders partition in the real q29 plan, result unchanged") {
    val confs = Seq(
      // force the fact join to SHUFFLE (the 100 TB shape; the dims keep
      // their explicit broadcast hints) — both the planner's and AQE's
      // own runtime broadcast thresholds must be off
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = graft.SparkEntry.queries("q29_local_supplier_volume")(spark, skewDir)
      val rows = q.collect().map(_.mkString("|"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not split the hot fact-join partition on the q29 shape:\n$plan")

      // same query, skew split OFF: the hot partition runs unsplit on
      // one reducer — slower shape, identical answer
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val unsplit = graft.SparkEntry.queries("q29_local_supplier_volume")(spark, skewDir)
        .collect().map(_.mkString("|"))
      assert(rows.toSeq === unsplit.toSeq,
        "the skew split must be a pure physical rewrite")
      assert(rows.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
