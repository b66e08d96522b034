package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Dev-only profiling main; not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (round <- 1 to 2) {
      time(s"r$round t01 full") { noop(SparkEntry.queries("t01_token_stats")(spark, dir)) }
      time(s"r$round t01 no orderBy") {
        noop(Tables(spark, dir, "documents")
          .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
          .select(col("doc_id"),
            size(col("tk")).as("n_tokens"),
            size(array_distinct(col("tk"))).as("n_distinct"),
            (aggregate(transform(col("tk"), t => length(t).cast("long")), lit(0L), (a, x) => a + x)
              .cast("double") / size(col("tk"))).as("avg_token_len"),
            (size(array_distinct(col("tk"))).cast("double") / size(col("tk"))).as("type_token_ratio")))
      }
      time(s"r$round t01 tokens+size only") {
        noop(Tables(spark, dir, "documents")
          .select(col("doc_id"), size(Text.tokens(col("text"))).as("n")))
      }
      time(s"r$round q16 full") { noop(SparkEntry.queries("q16_json_extract")(spark, dir)) }
      time(s"r$round q16 parse only") {
        noop(Tables(spark, dir, "events")
          .select(get_json_object(col("props"), "$.k").cast("int").as("k")))
      }
      time(s"r$round q07 full") { noop(SparkEntry.queries("q07_running_customer_spend")(spark, dir)) }
    }
    spark.stop()
  }
}
