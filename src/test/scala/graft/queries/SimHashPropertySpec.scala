package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Text

/** Randomized pigeonhole-exactness: the 4×8-bit band join must find
  * EVERY pair within Hamming distance 3 (and exactly those) that a
  * brute-force all-pairs comparison of the signatures finds — a silent
  * band-slicing bug (wrong shift, wrong mask) would lose recall
  * without failing any fixture-based gate.
  */
class SimHashPropertySpec extends SparkSpec {

  import spark.implicits._

  test("band-joined simhash pairs equal brute force on random corpora") {
    for (seed <- Seq(3, 17)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 24).map(i => s"t$i")
      def doc() = Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val base = Seq.fill(15)(doc())
      // mutated copies -> signatures a few bits apart
      val texts = base ++ Seq.fill(15) {
        val toks = base(rnd.nextInt(base.size)).split(" ").toBuffer
        toks(rnd.nextInt(toks.size)) = vocab(rnd.nextInt(vocab.size))
        toks.mkString(" ")
      }
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(col("doc_id"), Text.distinctShingles(col("text")).as("sh"))
      val got = Dedup.simhashPairs(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // brute force over the same signatures
      val sigs = docs
        .select(col("doc_id"), Text.simhash32(Text.fps(col("sh"))).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val want = (for {
        (a, sa) <- sigs; (b, sb) <- sigs if a < b
        h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
      } yield (a, b, h)).toSet
      assert(got === want, s"seed=$seed")
      assert(want.nonEmpty, s"fixture should plant near-identical signatures (seed=$seed)")
    }
  }
}
