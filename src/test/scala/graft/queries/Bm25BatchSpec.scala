package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed batch BM25 serving (r16 — the search family's v11b:
  * the query side as a relation): every query in a batch must score
  * its matched docs BIT-IDENTICALLY to the single-query driver path
  * [[TextAnalysis.bm25Indexed]] (the +0.0 padding identity makes the
  * fixed-width fold equal each query's written-order sum exactly), in
  * the same rank order; and the plan must be one distributed job —
  * the query relation broadcast, the posting fetch partition-pruned —
  * never a driver loop.
  */
class Bm25BatchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("batch == per-query indexed serving on matched docs, bit for bit") {
    val path = java.nio.file.Files.createTempDirectory("bm25batch").toString + "/idx"
    TextAnalysis.buildBm25Index(spark, dir, path)
    val k = 1 << 20
    val byQ = TextAnalysis.bm25Batch(spark, path, TextAnalysis.T16Batch, k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)

    for ((qid, terms) <- TextAnalysis.T16Batch) {
      // the single-query path ranks zero-score docs too (t14 parity);
      // restricted to MATCHED docs (any tf > 0) its order and scores
      // are the batch contract
      val single = TextAnalysis.bm25Indexed(spark, path, terms, k).collect()
        .filter(r => terms.indices.exists(i => r.getInt(1 + i) > 0))
        .map(r => (r.getLong(0), r.getDouble(1 + terms.size))).toSeq
      val batch = byQ(qid).sortBy(_._2).map(t => (t._3, t._4)).toSeq
      assert(batch === single,
        s"q_id=$qid (${terms.mkString(",")}): batch diverged from the driver path")
    }
  }

  test("relation path == Seq path bit for bit, on BOTH prune branches") {
    val path = java.nio.file.Files.createTempDirectory("bm25batchrel").toString + "/idx"
    TextAnalysis.buildBm25Index(spark, dir, path)
    import spark.implicits._
    val qdf = TextAnalysis.T16Batch
      .flatMap { case (q, ts) => ts.zipWithIndex.map { case (t, i) => (q, i, t) } }
      .toDF("q_id", "ti", "term")
    def bits(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))).toSeq
    val seqSide = bits(TextAnalysis.bm25Batch(spark, path, TextAnalysis.T16Batch, 10))
    // isin branch (12 distinct terms < cap): terms pushed as literals
    assert(bits(TextAnalysis.bm25BatchRel(spark, path, qdf, 10)) === seqSide,
      "relation path (term-isin branch) diverged from the Seq path")
    // runtime-prune branch (cap 0): bucket prune only, the query-
    // relation join restricts terms — scores must still be bit-equal
    assert(bits(TextAnalysis.bm25BatchRel(spark, path, qdf, 10, isinTermCap = 0)) === seqSide,
      "relation path (runtime-prune branch) diverged from the Seq path")
  }

  test("relation path keeps the static bucket prune without a term list") {
    val path = java.nio.file.Files.createTempDirectory("bm25batchrelplan").toString + "/idx"
    TextAnalysis.buildBm25Index(spark, dir, path)
    import spark.implicits._
    val qdf = TextAnalysis.T16Batch
      .flatMap { case (q, ts) => ts.zipWithIndex.map { case (t, i) => (q, i, t) } }
      .toDF("q_id", "ti", "term")
    val plan = TextAnalysis.bm25BatchRel(spark, path, qdf, 10, isinTermCap = 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("pbkt"),
      s"bucket pruning must survive the runtime-prune branch:\n$plan")
    assert(plan.contains("ObjectHashAggregate") && !plan.contains("Window"),
      s"the bounded-heap top-k must survive the relation path:\n$plan")
  }

  test("relation path rejects a duplicate (q_id, ti) cell loudly") {
    val path = java.nio.file.Files.createTempDirectory("bm25batchreldup").toString + "/idx"
    TextAnalysis.buildBm25Index(spark, dir, path)
    import spark.implicits._
    val bad = Seq((0L, 0, "dup"), (0L, 0, "vector")).toDF("q_id", "ti", "term")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bm25BatchRel(spark, path, bad, 10)
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("one distributed job: query relation broadcast, posting fetch pruned") {
    val path = java.nio.file.Files.createTempDirectory("bm25batchplan").toString + "/idx"
    TextAnalysis.buildBm25Index(spark, dir, path)
    val plan = TextAnalysis.bm25Batch(spark, path, TextAnalysis.T16Batch, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"the (q_id, ti, term) relation should broadcast:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("pbkt"),
      s"the posting fetch should keep the static bucket prune:\n$plan")
    // top-k per query is the algebraic bounded-heap aggregate (map-side
    // partial: k rows per query per partition cross the exchange), NOT
    // a rank window that would shuffle+sort every scored row (measured
    // 292 s at n_q=1000 on the 100x replica before the swap)
    assert(plan.contains("ObjectHashAggregate"),
      s"per-query top-k should run through the bounded-heap aggregate:\n$plan")
    assert(!plan.contains("Window"),
      s"no rank window may rank the scored relation:\n$plan")
  }
}
