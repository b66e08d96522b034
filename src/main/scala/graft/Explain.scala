package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for every SparkEntry query — the
  * evidence behind SCALE.md's claims (pushdown, broadcasts, partial
  * aggregation, TakeOrdered, no cartesian products).
  *
  * Usage: runMain graft.Explain <sfDir> <outFile> [nameFilter,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "/tmp/explains.txt"
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val w = new PrintWriter(new File(out))
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (only.isEmpty || only.contains(name)) {
          w.println(s"==== $name ====")
          try {
            val df = fn(spark, dir)
            w.println(df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          } catch { case e: Throwable => w.println(s"ERROR: ${e.getMessage}") }
          w.println()
        }
      }
    } finally w.close()
    spark.stop()
  }
}
