package graft.queries

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property evidence for the max-score prune's LOSSLESSNESS claim
  * (r18): random Zipf-skewed corpora × random batches × random k must
  * produce raw-bit-identical top-k with and without pruning. The
  * deterministic constructions in Bm25PruneSpec cover the argued edge
  * cases (ties at k, θ-disarm, OOV); this sweeps the space between
  * them — random df skews land queries on every mix of essential/
  * non-essential prefixes, including boundaries no one thought to
  * construct. Raw Gen with fixed seeds (the house PropertySpec
  * pattern — reproducible, no scalatest bridge).
  */
class Bm25PrunePropertySpec extends SparkSpec {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // Zipf-ish vocabulary: w0 everywhere, tail increasingly rare
  private val vocab = (0 until 20).map(i => s"w$i")
  private def docGen: Gen[String] = for {
    len <- Gen.choose(4, 24)
    words <- Gen.listOfN(len,
      Gen.frequency(vocab.zipWithIndex.map { case (w, i) =>
        (math.max(1, 400 / (i * i + 1)), Gen.const(w)) }: _*))
  } yield words.mkString(" ")

  private def queryGen: Gen[Seq[String]] = for {
    n <- Gen.choose(1, 4)
    ts <- Gen.listOfN(n, Gen.frequency(
      (19, Gen.oneOf(vocab)),
      (1, Gen.const("zzoov")))) // out-of-vocabulary: df=0 ceiling path
  } yield ts.distinct

  test("pruned == unpruned, raw bits, over random corpora × batches × k") {
    for (trial <- 0 until 5) {
      val nDocs = 60 + 20 * trial
      val docs = (0 until nDocs)
        .map(i => (i.toLong, sample(docGen, 1000L * trial + i)))
        .toDF("doc_id", "text")
      val path = java.nio.file.Files.createTempDirectory(s"bm25prop$trial")
        .toString + "/idx"
      TextAnalysis.buildBm25IndexOver(spark, docs, path)
      val batch = (0 until 6).map(q =>
        q.toLong -> sample(queryGen, 9000L * trial + q))
      val k = sample(Gen.oneOf(1, 2, 3, 5, 17), 77L + trial)
      def bits(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          java.lang.Double.doubleToRawLongBits(r.getDouble(3)))).toSeq
      assert(bits(TextAnalysis.bm25BatchPruned(spark, path, batch, k))
          === bits(TextAnalysis.bm25Batch(spark, path, batch, k)),
        s"trial=$trial k=$k batch=$batch")
    }
  }
}
