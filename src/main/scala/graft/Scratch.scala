package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Dev-only profiling main; not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), array_distinct(Text.shingles(Text.tokens(col("text")))).as("sh"))

    time("COLD sig write, orderBy") {
      docs.select(col("doc_id"), transform(col("sh"), sh => Text.charFp(sh)).as("fps"))
        .select(col("doc_id"), Text.minhashSig(col("fps")).as("sig"))
        .orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet("/tmp/scratch_d03c")
    }
    time("fps only count") {
      docs.select(col("doc_id"), transform(col("sh"), sh => Text.charFp(sh)).as("fps"))
        .selectExpr("doc_id", "size(fps) n").agg(sum("n")).head
    }
    time("sig count, no orderBy") {
      docs.select(col("doc_id"), transform(col("sh"), sh => Text.charFp(sh)).as("fps"))
        .select(col("doc_id"), Text.minhashSig(col("fps")).as("sig"))
        .selectExpr("doc_id", "size(sig) n").agg(sum("n")).head
    }
    time("sig write, no orderBy") {
      docs.select(col("doc_id"), transform(col("sh"), sh => Text.charFp(sh)).as("fps"))
        .select(col("doc_id"), Text.minhashSig(col("fps")).as("sig"))
        .coalesce(1).write.mode("overwrite").parquet("/tmp/scratch_d03a")
    }
    time("sig write, orderBy") {
      docs.select(col("doc_id"), transform(col("sh"), sh => Text.charFp(sh)).as("fps"))
        .select(col("doc_id"), Text.minhashSig(col("fps")).as("sig"))
        .orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet("/tmp/scratch_d03b")
    }
    spark.stop()
  }
}
