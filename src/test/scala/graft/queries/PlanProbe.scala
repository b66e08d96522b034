package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev plan-dump main (test scope): prints the FORMATTED executed plan
  * of the named `SparkEntry.queries` entries against a given SF dir —
  * the `.explain("formatted")` loop the scale audits use, runnable
  * without pasting query bodies into a console.
  *
  *   sbt "Test/runMain graft.queries.PlanProbe target/scaled/sf10salt q03_segment_revenue"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanProbe <sfDir> <query>[,query...]")
    val dir = args(0)
    val names = args(1).split(',').toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
