package graft.queries

import graft.SparkSpec

/** Per-query BM25 routing (r19 — bm25ServeSplit): on a corpus where
  * the per-query decisions genuinely DIVERGE, the split union must be
  * bit-identical to the unrouted relation path (per-query routing
  * composes t19's losslessness query by query), the decisions
  * themselves must point at each query's own regime (where the batch
  * router can only average), and the degenerate one-sided batches must
  * serve through the single-call shape unchanged.
  */
class Bm25SplitSpec extends SparkSpec {

  import spark.implicits._

  private def bits(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
    (r.getLong(0), r.getLong(1), r.getLong(2),
      java.lang.Double.doubleToRawLongBits(r.getDouble(3)))).toSeq

  // the Bm25RouteSpec skew corpus: 3 docs carry the rare term, 300 the
  // two common ones — per-query ratios are exact by construction
  private def skewIndex(): String = {
    val docs = (
      (0 until 3).map(i => (i.toLong, "signalterm alpha beta alpha")) ++
      (3 until 303).map(i => (i.toLong, "alpha beta alpha beta"))
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("bm25split")
      .toString + "/idx"
    TextAnalysis.buildBm25IndexOver(spark, docs, path)
    path
  }

  // a mixed batch whose queries route DIFFERENTLY: q0 rare-seed
  // (ratio 203 — pruned), q1 flat pair (ratio 2 — plain), q2
  // single-term (ratio 1 — plain)
  private val mixed = Seq(
    (0L, 0, "signalterm"), (0L, 1, "alpha"), (0L, 2, "beta"),
    (1L, 0, "alpha"), (1L, 1, "beta"),
    (2L, 0, "alpha"))

  test("the per-query decisions diverge on the mixed batch — and the " +
      "batch router would have averaged them") {
    val path = skewIndex()
    val routes = TextAnalysis.perQueryRoutes(spark, path,
      mixed.toDF("q_id", "ti", "term")).toMap
    assert(routes === Map(0L -> true, 1L -> false, 2L -> false),
      "q0 must route pruned, q1/q2 plain — the split's reason to exist")
    // the batch-level statistic on the same mix: tot = 609+606+303,
    // seed = 3+303+303 -> ratio ~2.5, one path for everyone
    assert(!TextAnalysis.bm25RoutedToPruned(spark, path,
      Seq(0L -> Seq("signalterm", "alpha", "beta"),
        1L -> Seq("alpha", "beta"), 2L -> Seq("alpha"))),
      "the batch router averages this mix to plain — q0 pays the " +
        "skewed-regime loss the split avoids")
  }

  test("split == unrouted relation path bit for bit on the diverging " +
      "mixed batch") {
    val path = skewIndex()
    val qrel = mixed.toDF("q_id", "ti", "term")
    assert(bits(TextAnalysis.bm25ServeSplit(spark, path, qrel, k = 3))
        === bits(TextAnalysis.bm25BatchRel(spark, path, qrel, k = 3)),
      "per-query routing changed answers — it may only change speed")
  }

  test("one-sided batches degrade to a single core call, still exact") {
    val path = skewIndex()
    // all-plain: both queries flat/single
    val plainRel = Seq((0L, 0, "alpha"), (0L, 1, "beta"), (1L, 0, "alpha"))
      .toDF("q_id", "ti", "term")
    assert(bits(TextAnalysis.bm25ServeSplit(spark, path, plainRel, k = 3))
        === bits(TextAnalysis.bm25BatchRel(spark, path, plainRel, k = 3)))
    // all-pruned: two rare-seed queries
    val prunedRel = Seq(
      (0L, 0, "signalterm"), (0L, 1, "alpha"), (0L, 2, "beta"),
      (1L, 0, "signalterm"), (1L, 1, "beta"))
      .toDF("q_id", "ti", "term")
    val routes = TextAnalysis.perQueryRoutes(spark, path, prunedRel).toMap
    assert(routes === Map(0L -> true, 1L -> true))
    assert(bits(TextAnalysis.bm25ServeSplit(spark, path, prunedRel, k = 3))
        === bits(TextAnalysis.bm25BatchRel(spark, path, prunedRel, k = 3)))
  }
}
