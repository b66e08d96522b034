package graft.queries

import graft.SparkSpec

/** ANN quality gate (v07): recall@3 of the IVF and banded-LSH variants
  * against brute-force exact ground truth on their own query sets. The
  * driver's oracle pins the exact recall values (deterministic ANN —
  * unusual, deliberate); this spec states the FLOOR so a silent
  * quality regression (probe-count, band-count, or plane-derivation
  * change that still hash-matches a regenerated oracle) fails loudly.
  *
  * Measured on the sf0.01 fixtures with the round-7 fixed
  * (non-degenerate) plane family: ivf 7/30 at nprobe=2 (1/8 scan),
  * lsh 6/30 at 4 bands x 8 bits (~4% scan). The synthetic embeddings
  * are near-isotropic between clusters — the documented hard case for
  * both index families; the floors record that honestly rather than
  * hiding it, and the dial tests below prove more scan buys more
  * recall.
  */
class SimilarityRecallSpec extends SparkSpec {

  test("v07: ANN recall@3 stays above the stated floors") {
    val rows = Similarity.annRecall(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet === Set("ivf", "lsh"))
    val (ivfQ, ivfHits, _) = rows("ivf")
    val (lshQ, lshHits, _) = rows("lsh")
    assert(ivfQ === 10L && lshQ === 10L)
    // floors: ivf ≥ 0.2 (6/30) at 12.5% scan, lsh ≥ 4/30 at ~4% scan
    assert(ivfHits >= 6L, s"IVF recall@3 regressed: $ivfHits/30")
    assert(lshHits >= 4L, s"LSH recall@3 regressed: $lshHits/30")
  }

  test("v07: the nprobe dial trades scan fraction for recall monotonically") {
    // nprobe is IVF's recall/cost dial (scan fraction = nprobe/nlist);
    // widening the probe set can only add candidates, so recall is
    // monotone — and at nprobe = nlist the probe covers everything, so
    // recall must be perfect (30/30). Catches any probe-selection bug
    // that the fixed nprobe=2 gate can't see.
    def ivfHits(nprobe: Int): Long =
      Similarity.annRecall(spark, "/root/testdata/sf0.01", ivfNprobe = nprobe)
        .collect().find(_.getString(0) == "ivf").get.getLong(2)
    val at2 = ivfHits(2); val at4 = ivfHits(4); val at16 = ivfHits(16)
    assert(at2 <= at4 && at4 <= at16, s"recall not monotone: $at2, $at4, $at16")
    assert(at16 === 30L, s"full probe must recover exact top-3, got $at16/30")
  }
}
