package graft.queries

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The p03 identity: the skew-safe two-phase range-bucket prefix sum
  * must equal the naive whole-source window on ANY distribution — the
  * bucket boundaries (approx percentiles) may shift with data, but the
  * result may not. Adversarial cases generated deterministically (the
  * PropertySpec pattern): heavy score TIES (bucket-boundary docs),
  * constant scores (every boundary equal — all docs land in one
  * bucket), single-doc sources, and a hot source holding most rows.
  */
class CurationEquivalenceSpec extends SparkSpec {

  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def run(rows: Seq[(Long, String, Int, Double)], budget: Long): Unit = {
    val d = rows.toDF("doc_id", "source", "n_tokens", "q")
    val twoPhase = Curation.tokenBudgetCut(d, budget).collect().map(_.toSeq).toSeq
    val naive = Curation.tokenBudgetCutNaive(d, budget).collect().map(_.toSeq).toSeq
    assert(twoPhase === naive, s"budget=$budget rows=${rows.take(5)}...")
  }

  test("two-phase cut ≡ naive window on random distributions with heavy ties") {
    val gen = for {
      src <- Gen.oneOf("hot", "hot", "hot", "a", "b") // skewed to one source
      tok <- Gen.choose(1, 200)
      // quality from a COARSE grid: many exact ties, incl. across docs
      q <- Gen.choose(0, 10).map(_ / 10.0)
    } yield (src, tok, q)
    for (seed <- Seq(1L, 100L, 5000L)) {
      val rows = samples(gen, 400, seed).zipWithIndex
        .map { case ((s, t, q), i) => (i.toLong, s, t, q) }
      for (budget <- Seq(0L, 37L, 1000L, 1000000L)) run(rows, budget)
    }
  }

  test("two-phase cut ≡ naive window when every score is identical") {
    // all boundaries equal q: size(filter(bnds, _ > q)) = 0 for every
    // doc — one bucket gets everything, base offsets must still be right
    val rows = (0L until 100L).map(i => (i, if (i % 3 == 0) "x" else "y", 10, 0.5))
    for (budget <- Seq(55L, 330L)) run(rows, budget)
  }

  test("two-phase cut ≡ naive window on single-doc sources and empty result") {
    val rows = Seq((1L, "solo", 50, 0.9), (2L, "duo", 10, 0.1), (3L, "duo", 10, 0.8))
    run(rows, budget = 60L)
    run(rows, budget = 5L) // nothing fits: both must return zero rows
  }
}
