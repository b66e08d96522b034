package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev measurement main (test scope): distributed batch BM25 serving
  * (r16, verdict ask #1) at the 100× replica — [[TextAnalysis
  * .bm25Batch]]'s one-job query relation vs the driver loop over
  * [[TextAnalysis.bm25Indexed]] it replaces, at growing batch sizes.
  * The loop is priced at a small n_q and reported per query (its cost
  * is linear by construction — one full Spark job per query); the
  * batch path is measured directly at each n_q.
  *
  *   sbt "Test/runMain graft.queries.Bm25BatchProbe [dir]"
  */
object Bm25BatchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10salt")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val path = Similarity.scratchPath("bm25batchbench", dir)
    println(f"[bm25batchprobe] index build: ${
      time(TextAnalysis.buildBm25Index(spark, dir, path))}%.1fs")

    // deterministic query workload over the fixture vocabulary:
    // 2-4 terms per query, round-robin with co-prime strides
    val vocab = Vector("spark", "window", "merge", "table", "column",
      "vector", "stream", "value", "data", "small", "join", "filter",
      "big", "group", "hash", "customer", "sort", "order", "slow",
      "line", "part", "fast", "the", "row", "agg", "key", "query",
      "scan", "batch", "dup")
    def mkQueries(n: Int): Seq[(Long, Seq[String])] =
      (0 until n).map { q =>
        val m = 2 + q % 3
        q.toLong -> (0 until m).map(i => vocab((q * 7 + i * 11) % vocab.size))
          .distinct
      }

    // the driver loop it replaces: one full job per query
    val loopQs = mkQueries(20)
    val tLoop = Seq.fill(2)(time(loopQs.foreach { case (_, ts) =>
      TextAnalysis.bm25Indexed(spark, path, ts, k = 10, matchedOnly = true)
        .write.format("noop").mode("overwrite").save()
    })).min
    println(f"[bm25batchprobe] driver loop: n_q=20 in $tLoop%.1fs " +
      f"(${tLoop / 20}%.2fs/query, linear by construction)")

    for (n <- Seq(20, 100, 1000)) {
      val qs = mkQueries(n)
      val t = Seq.fill(2)(time(
        TextAnalysis.bm25Batch(spark, path, qs, k = 10)
          .write.format("noop").mode("overwrite").save())).min
      println(f"[bm25batchprobe] batch serve: n_q=$n in $t%.1fs " +
        f"(${t / n * 1000}%.1fms/query)")
    }
    // the SELECTIVE regime (real search workloads): every fixture term
    // except 'dup' is corpus-common (~90% of docs), so the sweep above
    // is the worst case — every query scores ~the whole corpus, the
    // irreducible exact-BM25 work. 'dup' matches ~5%; this prices the
    // matched-set-proportional path. (Synthetic: the fixture vocabulary
    // has exactly one rare term, so all queries here share it.)
    val sel = (0 until 1000).map(q => q.toLong -> Seq("dup"))
    val tSel = Seq.fill(2)(time(
      TextAnalysis.bm25Batch(spark, path, sel, k = 10)
        .write.format("noop").mode("overwrite").save())).min
    println(f"[bm25batchprobe] batch serve, selective (rare-term) workload: " +
      f"n_q=1000 in $tSel%.1fs (${tSel}%.1fms/query)")

    // the RELATION-path readings live in Bm25RelProbe (reuses this
    // probe's scratch index, so the two can run back to back without
    // a second 100x build)
    spark.stop()
  }
}
