package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope, not part of the engine): A/B of
  * the r12 PPJoin positional filter on d02 at a scaled corpus —
  * candidate-pair volume and end-to-end wall time with the filter off
  * vs on, same session, interleaved passes.
  *
  *   sbt "Test/runMain graft.queries.D02Probe target/scaled/sf10salt"
  */
object D02Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10salt")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs = Dedup.shingleDocs(spark, dir).select("doc_id", "sh")
    // cost split: the checkpointed PPJoin index build alone (explode +
    // df join + per-doc rank window) vs the candidate join vs verify;
    // plus the index build's own stages, fresh lineage each
    import graft.functions.Text
    import org.apache.spark.sql.expressions.Window
    for (pass <- 1 to 2) {
      val ex = docs.select(col("doc_id"),
        explode(array_distinct(Text.fps(col("sh")))).as("s"))
      val (nex, tEx) = time(ex.count())
      val dfRel = ex.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= 50)
      val (ndf, tDf) = time(dfRel.count())
      val joined = ex.join(dfRel, "s")
      val (nj, tJ) = time(joined.count())
      val byDoc = Window.partitionBy("doc_id")
      val (nw, tW) = time(joined
        .select(col("doc_id"), col("s"),
          row_number().over(byDoc.orderBy("df", "s")).as("rk"),
          count(lit(1)).over(byDoc).as("n")).count())
      val (nb, tb) = time(Dedup.jaccardBaseAndCands(docs, 0.5, true)._1.count())
      println(f"[d02probe] pass=$pass explode=$nex%d/$tEx%.1fs df=$ndf%d/$tDf%.1fs " +
        f"join=$nj%d/$tJ%.1fs join+window=$nw%d/$tW%.1fs base_full=$nb%d/$tb%.1fs")
    }
    for (pass <- 1 to 2; positional <- Seq(false, true)) {
      val (nc, tc) = time(Dedup.jaccardCandidates(docs, 0.5, positional).count())
      val (_, tq) = time(Dedup.jaccardPairs(docs, 0.5, positional)
        .orderBy("a_id", "b_id")
        .write.format("noop").mode("overwrite").save())
      println(f"[d02probe] pass=$pass positional=$positional " +
        f"candidates=$nc%d cand_count_time=$tc%.1fs d02_wall=$tq%.1fs")
    }
    // persisted bucketed index (r14, PpIndex): build once, serve —
    // the zero-exchange candidate join vs the in-query rebuild
    spark.sql("DROP TABLE IF EXISTS d02probe_ppidx")
    // also clear a prior JVM's orphaned warehouse dir (no catalog entry
    // in this session → DROP is a no-op but saveAsTable would refuse)
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "d02probe_ppidx")
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    val (_, tBuild) = time(Dedup.buildPpIndex(spark, dir, "d02probe_ppidx"))
    for (pass <- 1 to 2) {
      val (_, tIdx) = time(Dedup.jaccardPairsIndexed(spark, "d02probe_ppidx")
        .orderBy("a_id", "b_id")
        .write.format("noop").mode("overwrite").save())
      println(f"[d02probe] pass=$pass ppindex build=$tBuild%.1fs indexed_wall=$tIdx%.1fs")
    }
    spark.sql("DROP TABLE IF EXISTS d02probe_ppidx")
    spark.stop()
  }
}
