package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x03's bloom-decontamination contract on synthetic corpora plus the
  * declared fixture gate. The bloom's defining property — NO false
  * negatives — must hold on any input; the measured false-positive
  * bound is asserted where the probe pool is large enough that the
  * binomial noise cannot flake the test (the declared query's global
  * pool; the tiny synthetic corpus passes bound=1.0 so only exactness
  * is under test there).
  */
class BloomDecontamSpec extends SparkSpec {

  test("exact flags and no-false-negative on a known-overlap corpus") {
    import spark.implicits._
    val docs = Seq(
      // eval (doc_id < 10)
      (1L, "ev", "e1 e2 e3 e4 e5"),
      // full copy of the eval doc — every shingle is a member
      (10L, "hot", "e1 e2 e3 e4 e5"),
      // disjoint vocabulary — zero members
      (11L, "cold", "x1 x2 x3 x4 x5"),
      (12L, "cold", "y1 y2 y3 y4 y5")
    ).toDF("doc_id", "source", "text")
    val out = Curation.bloomDecontam(docs, col("doc_id") < 10, bound = 1.0)
      .orderBy("source").collect()
    val bySource = out.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(bySource("hot") == ((1L, 1L, 1L, 1L)))
    assert(bySource("cold")._1 == 2L)
    assert(bySource("cold")._2 == 0L) // exact flags can't false-positive
    assert(out.forall(_.getLong(3) == 1L), "bloom reported a false negative")
  }

  test("bloom verdicts are partition-invariant (bit-OR merge is commutative)") {
    import spark.implicits._
    val docs = (0L until 200L).map { i =>
      (i, "s" + (i % 4), (0 until 8).map(j => "w" + ((i * 7 + j) % 40)).mkString(" "))
    }.toDF("doc_id", "source", "text")
    def run(parts: Int) =
      Curation.bloomDecontam(docs.repartition(parts), col("doc_id") % 10 === 0)
        .orderBy("source").collect().map(_.toSeq).toSeq
    assert(run(1) == run(13),
      "bloom output depends on input partitioning — the sketch merge is not order-free")
  }

  test("declared x03 gate holds at sf0.001 (global probe pool, real bound)") {
    val out = graft.SparkEntry.queries("x03_bloom_decontam")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(3) == 1L), "no_false_neg flag dropped")
    assert(out.forall(_.getLong(4) == 1L), "fp_within_bound flag dropped")
  }
}
