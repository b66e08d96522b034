package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Text

/** Randomized equivalence for the LSH-verified pair relation (the d04/
  * d06/d07/p01 edge definition): the band-bucket join + left-semi
  * counting verify must produce exactly the pairs a plain Scala
  * reimplementation finds — band-collide on ≥ 1 of the 4×4 signature
  * bands AND full-set Jaccard ≥ 0.5.
  */
class LshPairsPropertySpec extends SparkSpec {

  import spark.implicits._

  private def randomCorpus(seed: Int, nDocs: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 25).map(i => s"w$i")
    def fresh() = Seq.fill(6 + rnd.nextInt(24))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = Seq.fill(nDocs / 2)(fresh())
    val mutated = Seq.fill(nDocs - base.size) {
      val toks = base(rnd.nextInt(base.size)).split(" ").toBuffer
      (0 until 1 + rnd.nextInt(2)).foreach { _ =>
        toks(rnd.nextInt(toks.size)) = vocab(rnd.nextInt(vocab.size))
      }
      toks.mkString(" ")
    }
    rnd.shuffle(base ++ mutated)
  }

  test("lshVerifiedPairs equals a plain-Scala bands+jaccard reference on random corpora") {
    for (seed <- Seq(13, 29)) {
      val texts = randomCorpus(seed, 30)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(col("doc_id"), Text.distinctShingles(col("text")).as("sh"))
      val got = Dedup.lshVerifiedPairs(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // reference: signatures via the gated expression, pairing logic in
      // plain Scala (bands of 4, any-band collision, full-set jaccard)
      val rows = docs
        .select(col("doc_id"), col("sh"), Text.minhashSig(Text.fps(col("sh"))).as("sig"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[String](1).toSet,
          if (r.isNullAt(2)) null else r.getSeq[Long](2)))
      val want = (for {
        (a, sa, ga) <- rows; (b, sb, gb) <- rows
        if a < b && ga != null && gb != null
        if (0 until 4).exists(j => ga.slice(j * 4, j * 4 + 4) == gb.slice(j * 4, j * 4 + 4))
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size if j >= 0.5
      } yield (a, b)).toSet
      assert(got === want, s"seed=$seed")
      assert(want.nonEmpty, s"fixture should plant near-dups (seed=$seed)")
    }
  }
}
