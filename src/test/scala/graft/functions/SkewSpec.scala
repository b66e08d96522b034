package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("saltedAgg equals plain groupBy on a hot-key distribution") {
    // 10k rows of one hot key + scattered cold keys
    val df = spark.range(10000).select(
      when($"id" < 9000, lit("HOT")).otherwise(concat(lit("k"), $"id" % 50)).as("k"),
      ($"id" % 7).cast("double").as("v"))

    val salted = Skew.saltedAgg(df, "k", Seq(
      (sum($"v"), (c: org.apache.spark.sql.Column) => sum(c), "sum_v"),
      (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c), "n")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet

    val plain = df.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet

    assert(salted === plain)
  }

  test("phase-1 spreads the hot key over multiple salt buckets") {
    val df = spark.range(1000).repartition(4)
      .select(lit("HOT").as("k"), lit(1.0).as("v"))
    val salted = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(16)))
    assert(salted.select("__salt").distinct().count() > 1)
  }
}
