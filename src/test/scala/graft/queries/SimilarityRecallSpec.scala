package graft.queries

import graft.SparkSpec

/** ANN quality gate (v07): recall@3 of the IVF and LSH variants against
  * brute-force exact ground truth on their own query sets. The driver's
  * oracle pins the exact recall values (deterministic ANN — unusual,
  * deliberate); this spec states the FLOOR so a silent quality
  * regression (probe-count or bucket-width change that still
  * hash-matches a regenerated oracle) fails loudly.
  *
  * Measured on the sf0.01 fixtures: ivf 7/30 (min 0), lsh 20/30
  * (min 1). The synthetic embeddings are near-isotropic — no cluster
  * structure — which is the documented worst case for IVF at
  * nprobe/nlist = 1/8 scan; the floor records that honestly rather
  * than hiding it.
  */
class SimilarityRecallSpec extends SparkSpec {

  test("v07: ANN recall@3 stays above the stated floors") {
    val rows = Similarity.annRecall(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet === Set("ivf", "lsh"))
    val (ivfQ, ivfHits, _) = rows("ivf")
    val (lshQ, lshHits, lshMin) = rows("lsh")
    assert(ivfQ === 10L && lshQ === 10L)
    // floors: ivf ≥ 0.2 (6/30), lsh ≥ 0.5 (15/30)
    assert(ivfHits >= 6L, s"IVF recall@3 regressed: $ivfHits/30")
    assert(lshHits >= 15L, s"LSH recall@3 regressed: $lshHits/30")
    assert(lshMin >= 1L, "an LSH query lost all its true neighbors")
  }
}
