package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.Tables
import graft.functions.Text

/** Dev probe (test scope): why does x04's FUSED
  * materialize-checkpoint-inside-the-CMS-fold job cost ~25 s when the
  * same work split (count() to materialize, then fold from blocks)
  * costs ~3 s? A/B over agg composition with per-stage timings.
  */
object X04Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10salt")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(-1L)
        stages.add(f"    stage ${i.stageId}%d [${i.name.takeWhile(_ != '(')}] ${ms / 1000.0}%.1fs tasks=${i.numTasks}")
      }
    })
    def time[A](label: String)(f: => A): A = {
      stages.clear()
      val t0 = System.nanoTime(); val r = f
      println(f"[x04ab] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      stages.forEach(s => println(s))
      r
    }
    val eps = 0.001
    def freshCounts() = Tables(spark, dir, "documents")
      .select(explode(Text.shinglesAll(col("text"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("exact_n"))
      .localCheckpoint(eager = false)
    def cmsAgg = graft.functions.CmsWeighted(col("bigram"), col("exact_n"), eps, 0.99, 42).as("cms")

    // order shuffled vs the first probe run: is the anomaly the plan
    // SHAPE or the session state it runs in?
    for (round <- 1 to 2) {
      // E: no checkpoint at all, cms+sum straight over the agg
      val e = Tables(spark, dir, "documents")
        .select(explode(Text.shinglesAll(col("text"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("exact_n"))
      time(s"r$round E cms+sum no-checkpoint")(e.agg(cmsAgg, sum(col("exact_n")).as("n")).first())
      // A: split — materialize via count(), then fold from blocks
      val a = freshCounts()
      time(s"r$round A1 count() materialize")(a.count())
      time(s"r$round A2 cms+sum fold from blocks")(a.agg(cmsAgg, sum(col("exact_n")).as("n")).first())
      a.unpersist(blocking = true)
      // B: fused — fold materializes the checkpoint (the gated shape)
      val b = freshCounts()
      time(s"r$round B cms+sum fused")(b.agg(cmsAgg, sum(col("exact_n")).as("n")).first())
      b.unpersist(blocking = true)
    }
  }
}
