package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): max-score pruned batch BM25
  * (r18, verdict ask #1) at the 100× replicas — matched-row reduction
  * (the pivot's input volume, r16's measured 90% of batch cost) and
  * wall-clock, pruned vs unpruned, across three workloads:
  *
  *   - mixed corpus-common (the Bm25BatchProbe sweep: every term in
  *     ~90% of docs — near-flat dfs, the bound's WORST case);
  *   - flat-pair (exactly two corpus-common terms per query — the
  *     cleanest flat-df loser regime);
  *   - rare+common (the classic search shape: one selective term per
  *     query plus common context terms — the bound's home regime);
  *   - selective (rare term only — nothing to prune, prices overhead).
  *
  * r19 (verdict ask #1): each workload row also prints the ROUTER's
  * df-skew ratio and decision ([[TextAnalysis.bm25RouteStats]] /
  * Bm25RouteSkew) next to the measured winner — the table that backs
  * the threshold constant.
  *
  *   sbt "Test/runMain graft.queries.Bm25PruneProbe [dir] [workloads]"
  *
  * `workloads` = optional comma list to re-time a subset (e.g.
  * "flat-pair"); `ratios` alone prints the router statistic/decision
  * for ALL workloads without the timed runs (the decision columns are
  * timing-independent — wall winners for unchanged workloads are the
  * standing BENCHNOTES readings).
  */
object Bm25PruneProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf10salt")
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
      println(f"[bm25pruneprobe] index build: ${
        time(TextAnalysis.buildBm25Index(spark, dir, path))}%.1fs")
    }

    val vocab = Vector("spark", "window", "merge", "table", "column",
      "vector", "stream", "value", "data", "small", "join", "filter",
      "big", "group", "hash", "customer", "sort", "order", "slow",
      "line", "part", "fast", "the", "row", "agg", "key", "query",
      "scan", "batch", "dup")
    def mixed(n: Int): Seq[(Long, Seq[String])] =
      (0 until n).map { q =>
        val m = 2 + q % 3
        q.toLong -> (0 until m).map(i => vocab((q * 7 + i * 11) % vocab.size))
          .distinct
      }
    def rareCommon(n: Int): Seq[(Long, Seq[String])] =
      (0 until n).map { q =>
        q.toLong -> (Seq("dup") ++
          (0 until 2 + q % 2).map(i => vocab((q * 7 + i * 11) % (vocab.size - 1))))
          .distinct
      }
    def selective(n: Int): Seq[(Long, Seq[String])] =
      (0 until n).map(q => q.toLong -> Seq("dup"))
    def flatPair(n: Int): Seq[(Long, Seq[String])] =
      (0 until n).map { q =>
        q.toLong -> Seq(vocab(q % (vocab.size - 1)),
          vocab((q + 7) % (vocab.size - 1))).distinct
      }

    def matchedRows(qs: Seq[(Long, Seq[String])]): (Long, Long) = {
      val qrel = qs.flatMap { case (qid, ts) =>
        ts.zipWithIndex.map { case (t, i) => (qid, i, t) } }
        .toDF("q_id", "ti", "term")
      val allTerms = qs.flatMap(_._2).distinct
      val bkts = allTerms.map(t => graft.sources.BmIndex.bucketOf(t).toInt).distinct
      val post = graft.sources.BmIndex.postingsForBuckets(spark, path, bkts)
        .filter(col("term").isin(allTerms: _*))
      val matched0 = post.join(broadcast(qrel), Seq("term"))
      val ess = TextAnalysis.bm25EssentialFor(spark, path, qs, k = 10)
      val cand = post.join(broadcast(ess), Seq("term"))
        .select("q_id", "doc_id").distinct()
      (matched0.count(),
        matched0.join(cand, Seq("q_id", "doc_id"), "left_semi").count())
    }

    def routeRatio(qs: Seq[(Long, Seq[String])]): (Double, Boolean) = {
      val qrel = qs.flatMap { case (qid, ts) =>
        ts.zipWithIndex.map { case (t, i) => (qid, i, t) } }
        .toDF("q_id", "ti", "term")
      val (tot, seed) = TextAnalysis.bm25RouteStats(spark, path, qrel)
      (tot.toDouble / math.max(seed, 1L),
        TextAnalysis.bm25RoutedToPruned(spark, path, qs))
    }

    val sel = args.drop(1).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ratiosOnly = sel.exists(_.contains("ratios"))
    for ((name, qs) <- Seq(
        ("mixed-common", mixed(1000)),
        ("flat-pair", flatPair(1000)),
        ("rare+common", rareCommon(1000)),
        ("selective", selective(1000)))
        if ratiosOnly || sel.forall(_.contains(name))) {
      val (ratio, routed) = routeRatio(qs)
      val picked = if (routed) "pruned" else "plain"
      if (ratiosOnly) {
        // the router's own cost: the bm25RouteStats aggregation alone
        // (qrel ⋈ frozen df sibling → two sums), min of 2 — the number
        // behind "invisible next to the serving jobs it steers"
        val qrel = qs.flatMap { case (qid, ts) =>
          ts.zipWithIndex.map { case (t, i) => (qid, i, t) } }
          .toDF("q_id", "ti", "term")
        val tStats = Seq.fill(2)(time(
          TextAnalysis.bm25RouteStats(spark, path, qrel))).min
        println(f"[bm25pruneprobe] $name n_q=1000: " +
          f"router ratio=$ratio%.1f -> $picked (stats wall $tStats%.2fs)")
      } else {
        val (all, kept) = matchedRows(qs)
        val tPlain = Seq.fill(2)(time(
          TextAnalysis.bm25Batch(spark, path, qs, k = 10)
            .write.format("noop").mode("overwrite").save())).min
        val tPruned = Seq.fill(2)(time(
          TextAnalysis.bm25BatchPruned(spark, path, qs, k = 10)
            .write.format("noop").mode("overwrite").save())).min
        val winner = if (tPruned < tPlain) "pruned" else "plain"
        println(f"[bm25pruneprobe] $name n_q=1000: matched $all%,d -> " +
          f"$kept%,d (${100.0 * (all - kept) / math.max(all, 1)}%.1f%% pruned); " +
          f"plain $tPlain%.1fs, pruned $tPruned%.1fs; " +
          f"router ratio=$ratio%.1f -> $picked (winner $winner, " +
          s"${if (picked == winner) "MATCH" else "MISS"})")
      }
    }

    // --- split5050: the per-query router's money measurement (r19) ---
    // A 50/50 mix of the winning regime (rare+common) and a losing one
    // (flat-pair): the BATCH router must pick one path for everyone and
    // the wrong half pays; bm25ServeSplit routes each query itself.
    // Expect split ≈ the sum of each half served by its own winner.
    if (sel.exists(_.contains("split5050"))) {
      val qs = rareCommon(500) ++
        flatPair(500).map { case (q, ts) => (q + 500L) -> ts }
      val qrel = qs.flatMap { case (qid, ts) =>
        ts.zipWithIndex.map { case (t, i) => (qid, i, t) } }
        .toDF("q_id", "ti", "term")
      val routes = TextAnalysis.perQueryRoutes(spark, path, qrel)
      val nPruned = routes.count(_._2)
      val (ratio, routed) = routeRatio(qs)
      val tPlain = Seq.fill(2)(time(
        TextAnalysis.bm25Batch(spark, path, qs, k = 10)
          .write.format("noop").mode("overwrite").save())).min
      val tPruned = Seq.fill(2)(time(
        TextAnalysis.bm25BatchPruned(spark, path, qs, k = 10)
          .write.format("noop").mode("overwrite").save())).min
      val tSplit = Seq.fill(2)(time(
        TextAnalysis.bm25ServeSplit(spark, path, qrel, k = 10)
          .write.format("noop").mode("overwrite").save())).min
      println(f"[bm25pruneprobe] split5050 n_q=1000 " +
        f"(per-query routes: $nPruned pruned / ${routes.size - nPruned} plain; " +
        f"batch ratio=$ratio%.1f -> ${if (routed) "pruned" else "plain"}): " +
        f"plain $tPlain%.1fs, pruned $tPruned%.1fs, SPLIT $tSplit%.1fs")
    }
    spark.stop()
  }
}
