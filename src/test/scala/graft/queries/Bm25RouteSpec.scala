package graft.queries

import graft.SparkSpec

/** The BM25 serving regime router (r19, verdict ask #1): the routed
  * entry must be bit-identical to the unrouted relation path on the
  * mixed-regime gate batch (routing is speed-only), and the decision
  * must point at the measured winner's regime on controlled skews —
  * pruned for rare-seed/common-context batches, plain for flat-df and
  * single-term batches (Bm25PruneProbe's wall-clock table is the
  * measured ground truth; this pins the decision DIRECTION on corpora
  * where the regime is unambiguous by construction).
  */
class Bm25RouteSpec extends SparkSpec {

  import spark.implicits._

  private def bits(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
    (r.getLong(0), r.getLong(1), r.getLong(2),
      java.lang.Double.doubleToRawLongBits(r.getDouble(3)))).toSeq

  // 3 docs carry the rare term, 300 the two common ones — the
  // Bm25PruneSpec skew corpus, where dfs are controlled exactly
  private def skewIndex(): String = {
    val docs = (
      (0 until 3).map(i => (i.toLong, "signalterm alpha beta alpha")) ++
      (3 until 303).map(i => (i.toLong, "alpha beta alpha beta"))
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("bm25route")
      .toString + "/idx"
    TextAnalysis.buildBm25IndexOver(spark, docs, path)
    path
  }

  test("routed serving == unrouted relation path bit for bit on the " +
      "mixed-regime gate batch") {
    val path = java.nio.file.Files.createTempDirectory("bm25routefix")
      .toString + "/idx"
    TextAnalysis.buildBm25Index(spark, "/root/testdata/sf0.01", path)
    val qrel = TextAnalysis.T20Batch
      .flatMap { case (q, ts) => ts.zipWithIndex.map { case (t, i) => (q, i, t) } }
      .toDF("q_id", "ti", "term")
    assert(bits(TextAnalysis.bm25Serve(spark, path, qrel, k = 10))
        === bits(TextAnalysis.bm25BatchRel(spark, path, qrel, k = 10)),
      "the router changed answers — it may only change speed")
  }

  test("decision direction: rare-seed batches route pruned; flat-df " +
      "and single-term batches route plain") {
    val path = skewIndex()
    // rare seed + common context: ratio = (3+303+303)/3 = 203 — pruned
    assert(TextAnalysis.bm25RoutedToPruned(spark, path,
      Seq(0L -> Seq("signalterm", "alpha", "beta"))),
      "rare-seed/common-context must route to the pruned path")
    // flat dfs: ratio = 606/303 = 2 — the measured 1.4x-loss regime
    assert(!TextAnalysis.bm25RoutedToPruned(spark, path,
      Seq(0L -> Seq("alpha", "beta"))),
      "flat-df multi-term must route to the plain path")
    // single term: ratio exactly 1 — the seed pass is pure duplication
    assert(!TextAnalysis.bm25RoutedToPruned(spark, path,
      Seq(0L -> Seq("alpha"))),
      "single-term must route to the plain path")
    // the decision is per BATCH: a majority of flat queries pulls the
    // summed statistic under the threshold even with one skewed query
    // in the mix (tot = 609 + 30*606, seed = 3 + 30*303 -> ratio ~2)
    assert(!TextAnalysis.bm25RoutedToPruned(spark, path,
      (0L -> Seq("signalterm", "alpha", "beta")) +:
        (1 to 30).map(q => q.toLong -> Seq("alpha", "beta"))),
      "a flat-dominated batch must route plain (the statistic sums)")
  }

  test("out-of-vocabulary terms: df=0 is excluded from the seed, so a " +
      "flat-df batch with one OOV term still routes plain, and serving " +
      "stays bit-equal either way") {
    val path = skewIndex()
    // r20 (ADVICE): pre-fix, the OOV term's df=0 masqueraded as a rare
    // seed (ratio tot/1 = 606 >> threshold) and routed this flat-df
    // batch pruned against the measured plain-wins regime. With df>0
    // seeds the ratio is 606/303 = 2 — plain.
    assert(!TextAnalysis.bm25RoutedToPruned(spark, path,
      Seq(0L -> Seq("ghostterm", "alpha", "beta"))),
      "an OOV term must not masquerade as a rare seed in the router")
    // a genuinely rare in-vocab seed still routes pruned with the OOV
    // term along for the ride
    assert(TextAnalysis.bm25RoutedToPruned(spark, path,
      Seq(0L -> Seq("ghostterm", "signalterm", "alpha", "beta"))),
      "an in-vocab rare seed must still route pruned despite an OOV term")
    // all-OOV: both sums are 0, ratio 0 — plain (matches nothing anyway)
    assert(!TextAnalysis.bm25RoutedToPruned(spark, path,
      Seq(0L -> Seq("ghostterm", "phantomterm"))),
      "an all-OOV query contributes nothing and must route plain")
    // and whichever path runs, output == the plain relation path exactly
    val qrel = Seq((0L, 0, "ghostterm"), (0L, 1, "alpha"), (0L, 2, "beta"))
      .toDF("q_id", "ti", "term")
    assert(bits(TextAnalysis.bm25Serve(spark, path, qrel, k = 3))
        === bits(TextAnalysis.bm25BatchRel(spark, path, qrel, k = 3)))
  }
}
