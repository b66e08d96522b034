package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** c06's production (sketch) threshold pass — `adaptiveQualityApprox`
  * (queries/Curation.scala): percentile_approx(accuracy=1000) bounds
  * rank error by n/1000, so the approx p25 cut must keep within that
  * rank window of the exact cut. These are the engine-side halves of
  * the cross-engine contract the gated `c06b_adaptive_quality_approx`
  * asserts every round.
  */
class AdaptiveApproxSpec extends SparkSpec {

  import spark.implicits._

  test("approx cut stays within the sketch's rank window of the exact cut (fixtures)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.Tables(spark, dir, "documents")
      val approx = Curation.adaptiveQualityApprox(docs).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // exact n_kept from the gated exact form (col 2 = n_kept)
      val exact = Curation.queries("c06_adaptive_quality")(spark, dir).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(approx.keySet === exact.keySet)
      approx.foreach { case (src, (n, kept)) =>
        // the approx threshold is an element whose rank is within n/1000
        // of 0.25n; allow the gate's 50x margin (±0.05n) plus 2 rows of
        // boundary/tie slack — far tighter than any real sketch break
        val window = math.ceil(0.05 * n).toLong + 2
        assert(math.abs(kept - exact(src)) <= window,
          s"$dir $src: approx kept=$kept vs exact=${exact(src)} (n=$n, window=$window)")
      }
    }
  }

  test("tie-heavy and single-doc sources keep the cut total, not crash") {
    // all-equal scores: thr == the shared q, so q >= thr keeps EVERY doc
    // in both forms; a single-doc source keeps its one doc
    val sameText = "the quick brown fox jumps over the lazy dog again and again"
    val docs = ((1L to 30L).map(i => (i, "ties", sameText)) :+
      (100L, "solo", "one lonely document with enough words to score"))
      .toDF("doc_id", "source", "text")
    val out = Curation.adaptiveQualityApprox(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("ties") === ((30L, 30L)))
    assert(out("solo") === ((1L, 1L)))
  }
}
