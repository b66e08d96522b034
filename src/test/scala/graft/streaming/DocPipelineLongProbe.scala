package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): the INCREMENTAL pipeline priced
  * at realistic document lengths (r19 — the follow-up BENCHNOTES'
  * longsalt verify section promises: "per batch, verify touches only
  * history∪batch candidates"). All prior DocPipeline pricing (p06,
  * d13b) ran at ~54-token docs; at 600 tokens the per-batch text
  * kernels, the window-fp store, and the banded verify all scale with
  * text length, so this drives [[DocPipeline.processBatch]] over the
  * sf10longsalt corpus in in-order doc_id slices and reads:
  *
  *   - per-batch ingest wall (text kernels + band join + exact verify
  *     + winfp winners + the four state appends), batch by batch —
  *     the number a real streaming deployment budgets per micro-batch;
  *   - the maintained edge artifact's economics at long docs: the
  *     d13b-shape READ of [[DocPipeline.edgesStore]] vs the full
  *     [[graft.queries.Dedup.lshVerifiedPairs]] recompute over the
  *     finished store's shingle state (the r18 cost the store
  *     removed), plus count equality between them — the small-scale
  *     DocPipelineSpec equality re-checked at 500k×600 tokens;
  *   - [[DocPipeline.edgesProbe]]'s consistency row.
  *
  *   sbt "Test/runMain graft.streaming.DocPipelineLongProbe [dir] [nBatches]"
  */
object DocPipelineLongProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10longsalt")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val stateDir = "/tmp/graft-dplong-" +
      java.lang.Integer.toHexString(dir.hashCode)
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(stateDir), true) // fresh pricing run

    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        md5(col("text")).as("text_hash"))
    // in-order slices by doc_id RANGE (the pipeline's enforced arrival
    // contract); approx boundaries are fine — ranges partition either way
    val bounds = docs.stat.approxQuantile("doc_id",
      (1 until nBatches).map(_.toDouble / nBatches).toArray, 0.001)
      .map(_.toLong)
    val lows = Long.MinValue +: bounds
    val highs = bounds :+ Long.MaxValue

    var total = 0.0
    for (i <- 0 until nBatches) {
      val slice = docs.filter(col("doc_id") >= lows(i) &&
        col("doc_id") < highs(i))
      val t = time(DocPipeline.processBatch(slice, stateDir))
      total += t
      println(f"[dplongprobe] batch $i: $t%.1fs (cumulative $total%.1fs)")
    }
    val nDocs = DocPipeline.docsStore(spark, stateDir).count()
    println(f"[dplongprobe] ingest total=$total%.1fs docs_stored=$nDocs%,d " +
      f"(${total / nBatches}%.1fs/batch avg over $nBatches batches)")

    // the d13b economics at long docs: edge READ vs full recompute
    val tRead = Seq.fill(2)(time(
      DocPipeline.edgesStore(spark, stateDir)
        .write.format("noop").mode("overwrite").save())).min
    val nEdges = DocPipeline.edgesStore(spark, stateDir).count()
    val shingled = DocPipeline.docsStore(spark, stateDir)
      .select(col("doc_id"), col("sh"))
    val tRecompute = time(
      graft.queries.Dedup.lshVerifiedPairs(shingled)
        .write.format("noop").mode("overwrite").save())
    val nRecompute = graft.queries.Dedup.lshVerifiedPairs(shingled).count()
    println(f"[dplongprobe] edges: read=$tRead%.1fs ($nEdges%,d rows) vs " +
      f"recompute=$tRecompute%.1fs ($nRecompute%,d rows) — " +
      s"counts ${if (nEdges == nRecompute) "EQUAL" else "DIFFER"}")
    println(s"[dplongprobe] edgesProbe: " +
      DocPipeline.edgesProbe(spark, stateDir).head().toString)
    spark.stop()
  }
}
