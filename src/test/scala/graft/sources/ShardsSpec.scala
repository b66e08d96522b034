package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic shard export: stable assignment, reproducible shard
  * content across runs, and partition pruning on the shard dir.
  */
class ShardsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("shard content is identical across two independent writes") {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val p1 = java.nio.file.Files.createTempDirectory("shards1").toString
    val p2 = java.nio.file.Files.createTempDirectory("shards2").toString
    Shards.writeShards(docs, p1, "doc_id", nShards = 4)
    Shards.writeShards(docs, p2, "doc_id", nShards = 4)
    def slurp(p: String) = spark.read.parquet(p)
      .collect().map(r => (r.getAs[Int]("shard"), r.getLong(0), r.getString(1))).sorted.toSeq
    assert(slurp(p1) === slurp(p2))
    assert(slurp(p1).nonEmpty)
    // every row's shard matches the read-side mirror
    spark.read.parquet(p1).select("doc_id", "shard").collect().foreach { r =>
      assert(r.getAs[Int]("shard") === Shards.shardOf(r.getLong(0).toString, 4))
    }
  }

  test("reading one shard scans only that shard's files (partition pruning)") {
    val docs = graft.Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val p = java.nio.file.Files.createTempDirectory("shards3").toString
    Shards.writeShards(docs, p, "doc_id", nShards = 4)
    val one = spark.read.parquet(p).filter(col("shard") === 2)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(shard"), plan)
    val files = one.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("shard=2")), files.mkString(","))
  }
}
