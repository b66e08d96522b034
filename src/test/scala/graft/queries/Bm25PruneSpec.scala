package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Max-score pruned batch BM25 (r18, verdict ask #1): pruning must be
  * LOSSLESS — bit-equal to the unpruned batch at raw-bits granularity
  * — and must actually FIRE where the bound says it can: on a skewed
  * fixture (one rare term + dominant common terms) the common terms'
  * cumulative score ceiling cannot reach the rare-seeded k-th score,
  * so they leave the essential set and their posting lists leave
  * candidate generation.
  */
class Bm25PruneSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def bits(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
    (r.getLong(0), r.getLong(1), r.getLong(2),
      java.lang.Double.doubleToRawLongBits(r.getDouble(3)))).toSeq

  test("pruned == unpruned bit for bit on the fixture batch") {
    val path = java.nio.file.Files.createTempDirectory("bm25prune")
      .toString + "/idx"
    TextAnalysis.buildBm25Index(spark, dir, path)
    for (k <- Seq(1, 10, 1 << 20)) {
      assert(bits(TextAnalysis.bm25BatchPruned(spark, path, TextAnalysis.T16Batch, k))
          === bits(TextAnalysis.bm25Batch(spark, path, TextAnalysis.T16Batch, k)),
        s"pruned path diverged from the unpruned batch at k=$k")
    }
  }

  test("skewed fixture: common terms leave the essential set; result " +
      "stays bit-equal") {
    // 3 docs carry the rare term; 300 carry only the two common terms.
    // ub(common) ≈ idf(~300 of 303)·2.2 ≈ 0.04 each, while θ (the k-th
    // rare-seeded partial) is ~75 — both commons are provably
    // non-essential, so candidates collapse from ~303 to the 3
    // rare-term docs.
    val docs = (
      (0 until 3).map(i => (i.toLong, "signalterm alpha beta alpha")) ++
      (3 until 303).map(i => (i.toLong, "alpha beta alpha beta"))
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("bm25pruneskew")
      .toString + "/idx"
    TextAnalysis.buildBm25IndexOver(spark, docs, path)
    val batch = Seq(0L -> Seq("signalterm", "alpha", "beta"))
    val ess = TextAnalysis.bm25EssentialFor(spark, path, batch, k = 2)
      .collect().map(_.getString(1)).toSet
    assert(ess === Set("signalterm"),
      s"both common terms should prune at k=2 (essential: $ess)")
    // lossless anyway: the pruned top-k equals the unpruned top-k —
    // including the case where a common-only doc would have ranked
    // below the rare docs
    assert(bits(TextAnalysis.bm25BatchPruned(spark, path, batch, 2))
        === bits(TextAnalysis.bm25Batch(spark, path, batch, 2)))
    // at k past the rare list's length θ seeds from fewer than k
    // partials → −∞ → nothing prunes, everything stays essential
    val essAll = TextAnalysis.bm25EssentialFor(spark, path, batch, k = 5)
      .collect().map(_.getString(1)).toSet
    assert(essAll === Set("signalterm", "alpha", "beta"),
      s"θ must disarm when the seed list is shorter than k (essential: $essAll)")
    assert(bits(TextAnalysis.bm25BatchPruned(spark, path, batch, 5))
        === bits(TextAnalysis.bm25Batch(spark, path, batch, 5)))
  }

  test("pruned plan: top-k through the bounded heap; no window ranks " +
      "scored rows (bound windows touch only the query-side relation)") {
    val path = java.nio.file.Files.createTempDirectory("bm25pruneplan")
      .toString + "/idx"
    TextAnalysis.buildBm25Index(spark, dir, path)
    val plan = TextAnalysis
      .bm25BatchPruned(spark, path, TextAnalysis.T16Batch, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"per-query top-k should run through the bounded-heap aggregate:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("pbkt"),
      s"the posting fetch should keep the static bucket prune:\n$plan")
    // the prune machinery's windows (seed pick, cumulative bound) run
    // over the n_q×m query-side relation — none may order by a score
    // column, which would be the n_q×matched-docs rank window the
    // aggregator exists to avoid
    plan.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(!l.contains("score") && !l.contains("cosine"),
        s"a window ranks scored rows:\n$l")
    }
  }

  test("adversarial boundary: the k-th doc ties across lists and " +
      "doc_id breaks the tie — pruning may not change the winner") {
    // two identical-score docs in DIFFERENT posting lists: doc 0 via
    // the rare term, doc 1 via an equally-rare second term; k=1 must
    // pick doc 0 (doc_id tiebreak) with and without pruning
    val docs = (
      Seq((0L, "aaa filler"), (1L, "bbb filler")) ++
      (2 until 202).map(i => (i.toLong, "filler filler"))
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("bm25prunetie")
      .toString + "/idx"
    TextAnalysis.buildBm25IndexOver(spark, docs, path)
    val batch = Seq(0L -> Seq("aaa", "bbb", "filler"))
    for (k <- 1 to 4) {
      assert(bits(TextAnalysis.bm25BatchPruned(spark, path, batch, k))
          === bits(TextAnalysis.bm25Batch(spark, path, batch, k)),
        s"tie boundary diverged at k=$k")
    }
  }
}
