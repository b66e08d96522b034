package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway-style stage diagnostic for bm25Batch at n_q=1000 (dev
  * main, test scope): prices the posting fetch + query join, the
  * (q_id, doc) pivot, and the doclens join separately so optimization
  * effort lands where the time is.
  */
object Bm25BatchDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10salt")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $tag: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val path = Similarity.scratchPath("bm25batchbench", dir)
    // reuse the probe's index if present, else build
    if (!new java.io.File(path + "_stats").exists())
      TextAnalysis.buildBm25Index(spark, dir, path)
    val vocab = Vector("spark", "window", "merge", "table", "column",
      "vector", "stream", "value", "data", "small", "join", "filter",
      "big", "group", "hash", "customer", "sort", "order", "slow",
      "line", "part", "fast", "the", "row", "agg", "key", "query",
      "scan", "batch", "dup")
    val qs = (0 until 1000).map { q =>
      val m = 2 + q % 3
      q.toLong -> (0 until m).map(i => vocab((q * 7 + i * 11) % vocab.size)).distinct
    }
    import spark.implicits._
    val qrel = qs.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (t, i) => (qid, i, t) } }
      .toDF("q_id", "ti", "term")
    val allTerms = qs.flatMap(_._2).distinct
    val post = graft.sources.BmIndex.postingsFor(spark, path, allTerms)
    time("posting fetch alone (count)")(post.count())
    val matched = post.join(broadcast(qrel), Seq("term"))
    time("matched rows (count)")(matched.count())
    val tfAggs = (0 until 4).map(i =>
      coalesce(max(when(col("ti") === i, col("tf"))), lit(0L)).as(s"tf$i"))
    val tfs = matched.groupBy("q_id", "doc_id").agg(tfAggs.head, tfAggs.tail: _*)
    time("pivot groupBy (count)")(tfs.count())
    val j = tfs.join(graft.sources.BmIndex.doclens(spark, path), Seq("doc_id"))
    time("pivot + doclens join (count)")(j.count())
    spark.stop()
  }
}
