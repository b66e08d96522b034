package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): the r16 staleness probes
  * ([[Dedup.ppIndexDrift]], [[graft.sources.BmIndex.driftProbe]])
  * priced against appended fraction on the dup-dense 100× replica —
  * the table a maintenance job's rebuild threshold is calibrated
  * from. Also times the probes themselves (they must stay cheap
  * enough to run per maintenance cycle).
  *
  *   sbt "Test/runMain graft.queries.DriftProbe [dir]"
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10dup")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def reset(table: String): Unit =
      for (t <- Seq(table, table + "_df", table + "_c")) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val wh = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), t)
        wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
      }

    val docs = Dedup.shingleDocs(spark, dir).localCheckpoint(eager = false)
    val texts = graft.Tables(spark, dir, "documents").select("doc_id", "text")
      .localCheckpoint(eager = false)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)

    for (frac <- Seq(0.10, 0.25, 0.50)) {
      val cut = (maxId * (1.0 - frac)).toLong
      val pct = (frac * 100).toInt

      val table = s"driftx_pp$pct"
      reset(table)
      Dedup.buildPpIndexOver(spark, docs.filter(col("doc_id") <= cut), table)
      Dedup.appendToPpIndex(spark, table, docs.filter(col("doc_id") > cut))
      val (pp, tPp) = time(Dedup.ppIndexDrift(spark, table).head())
      println(f"[driftprobe] PpIndex appended=$pct%%: n_fps=${pp.getAs[Long]("n_fps")} " +
        f"n_crossed=${pp.getAs[Long]("n_crossed")} crossed_frac=${pp.getAs[Double]("crossed_frac")}%.4f " +
        f"max_df_now=${pp.getAs[Long]("max_df_now")} (probe $tPp%.1fs)")

      val bmPath = Similarity.scratchPath(s"driftbm$pct", dir)
      TextAnalysis.buildBm25IndexOver(spark,
        texts.filter(col("doc_id") <= cut), bmPath)
      TextAnalysis.appendToBm25Index(spark, bmPath,
        texts.filter(col("doc_id") > cut))
      val (bm, tBm) = time(
        graft.sources.BmIndex.driftProbe(spark, bmPath).head())
      println(f"[driftprobe] BmIndex appended=$pct%%: " +
        f"appended_frac=${bm.getAs[Double]("appended_frac")}%.4f " +
        f"avgdl_frozen=${bm.getAs[Double]("avgdl_frozen")}%.2f " +
        f"avgdl_now=${bm.getAs[Double]("avgdl_now")}%.2f " +
        f"avgdl_drift=${bm.getAs[Double]("avgdl_drift")}%.5f (probe $tBm%.1fs)")
    }
    spark.stop()
  }
}
