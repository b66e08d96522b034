package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** c01/c03's bloom prefilter (r11, `Curation.contaminationOver`): the
  * map-side eval-fingerprint bloom may only SKIP docs with provably
  * zero overlap (no false negatives), so the prefiltered form must be
  * row-identical to the naive corpus-wide semi-join — on the fixtures
  * and on corpora built to stress the edges.
  */
class ContaminationPrefilterSpec extends SparkSpec {

  import spark.implicits._

  private def both(raw: DataFrame): (Array[String], Array[String]) = {
    def canon(df: DataFrame) = df.orderBy("doc_id")
      .collect().map(_.toSeq.mkString("|"))
    (canon(Curation.contaminationOver(raw, prefilter = false)),
      canon(Curation.contaminationOver(raw, prefilter = true)))
  }

  test("prefiltered == naive on the fixtures") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val (naive, pre) = both(graft.Tables(spark, dir, "documents"))
      assert(naive.nonEmpty && naive.sameElements(pre), dir)
    }
  }

  test("prefiltered == naive on edge corpora: full overlap, zero overlap, empty eval") {
    // doc_id 0/50/100 are eval (the %50 carve-out); 'twin' docs repeat
    // eval text verbatim (frac 1.0), 'clean' docs share nothing
    val overlap = Seq(
      (0L, "a", "alpha beta gamma delta epsilon zeta"),
      (50L, "a", "one two three four five six"),
      (1L, "a", "alpha beta gamma delta epsilon zeta"),   // full overlap
      (2L, "b", "one two three four five six seven"),      // partial
      (3L, "b", "totally unrelated words appear here now") // zero
    ).toDF("doc_id", "source", "text")
    val (n1, p1) = both(overlap)
    assert(n1.sameElements(p1) && n1.length === 3)
    // zero-overlap corpus: the prefilter must still emit EVERY train
    // doc (with frac 0), not silently drop the unflagged ones
    val clean = Seq(
      (0L, "a", "eval only text lives here quietly"),
      (1L, "a", "first clean doc with its own words"),
      (2L, "b", "second clean doc nothing shared at all")
    ).toDF("doc_id", "source", "text")
    val (n2, p2) = both(clean)
    assert(n2.sameElements(p2) && n2.length === 2)
    assert(p2.forall(_.endsWith("|0.0")))
    // no eval docs at all: empty bloom, all train rows survive at 0.0
    val noEval = Seq(
      (1L, "a", "only train docs exist in this corpus"),
      (2L, "a", "and none of them can be contaminated")
    ).toDF("doc_id", "source", "text")
    val (n3, p3) = both(noEval)
    assert(n3.sameElements(p3) && n3.length === 2)
  }
}
