package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): the t18 isin threshold, swept
  * (r18, verdict ask #6). bm25BatchRel pushes the batch's distinct
  * terms as a literal `isin` when they fit `isinTermCap` (64 until
  * this sweep — a constant chosen without data); above it the scan
  * reads the pruned buckets wholesale and the query-relation join
  * restricts terms at runtime. This prices BOTH branches at
  * n_distinct_terms ∈ {16, 64, 256, 1024, 4096} on a 100× replica:
  * where does the literal list stop paying (plan-size bloat vs scan
  * savings)?
  *
  * Terms come from the corpus vocabulary STRATIFIED by df rank (every
  * (V/p)-th term of the df-ordered vocabulary) — queries mix common
  * and rare terms, the realistic batch shape, and the isin-vs-runtime
  * delta is visible on both the scan side (selective terms) and the
  * plan side (literal-list size). One reading per cell (the deltas of
  * interest are multi-second).
  *
  *   sbt "Test/runMain graft.queries.IsinSweepProbe [dir]"
  */
object IsinSweepProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10salt")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val path = Similarity.scratchPath("bm25batchbench", dir)
    if (!new java.io.File(path).exists()) {
      println(f"[isinsweep] index build: ${
        time(TextAnalysis.buildBm25Index(spark, dir, path))}%.1fs")
    }

    val qp = Similarity.scratchPath("isinsweepq", dir)
    val vocab = graft.sources.BmIndex.dfRel(spark, path)
      .orderBy(col("df").desc, col("term"))
      .collect().map(_.getString(0))
    println(s"[isinsweep] vocabulary: ${vocab.length} terms")
    for (p <- Seq(16, 64, 256, 1024, 4096)) {
      if (vocab.length < p) {
        println(s"[isinsweep] p=$p: vocabulary exhausted at ${vocab.length}, skipping")
      } else {
        val stride = vocab.length / p
        val pool = (0 until p).map(i => vocab(i * stride))
        val qrel = (0 until 1000).flatMap { q =>
          (0 until 3).map(i => (q.toLong, i, pool((q * 13 + i * 7) % p)))
        }.toDF("q_id", "ti", "term")
        qrel.repartition(1).write.mode("overwrite").parquet(qp)
        val qdf = spark.read.parquet(qp)
        val tPush = time(
          TextAnalysis.bm25BatchRel(spark, path, qdf, 10, isinTermCap = p)
            .write.format("noop").mode("overwrite").save())
        val tRuntime = time(
          TextAnalysis.bm25BatchRel(spark, path, qdf, 10, isinTermCap = 0)
            .write.format("noop").mode("overwrite").save())
        println(f"[isinsweep] n_terms=$p: pushed=$tPush%.1fs " +
          f"runtime-join=$tRuntime%.1fs")
      }
    }
    spark.stop()
  }
}
