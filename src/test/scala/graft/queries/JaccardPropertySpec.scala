package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Text

/** Randomized equivalence: the prefix-filter jaccardPairs must produce
  * EXACTLY the pairs of a naive all-pairs counting reference (same df
  * cap, no prefix), on random corpora with planted near-dups and at
  * thresholds other than the oracle-gated t = 0.5 — the ⌈t·n⌉ prefix
  * boundary and the length filter get exercised across t.
  */
class JaccardPropertySpec extends SparkSpec {

  import spark.implicits._

  private def docsOf(texts: Seq[String]): DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .select(col("doc_id"), Text.distinctShingles(col("text")).as("sh"))

  /** All-pairs counting reference with the same MaxDf = 50 cap. */
  private def naivePairs(docs: DataFrame, t: Double): Set[(Long, Long, Double)] = {
    val ex = docs.select(col("doc_id"),
      explode(array_distinct(Text.fps(col("sh")))).as("s"))
    val kept = ex.join(
      ex.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 50).select("s"), "s")
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    kept.as("a").join(kept.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("nc"))
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        (col("nc").cast("double") / (col("na") + col("nb") - col("nc"))).as("j"))
      .filter(col("j") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def randomCorpus(seed: Int, nDocs: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 30).map(i => s"w$i")
    def fresh() = Seq.fill(5 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = Seq.fill(nDocs / 2)(fresh())
    // plant near-dups: mutate a base doc by swapping a few tokens
    val mutated = Seq.fill(nDocs - base.size) {
      val toks = base(rnd.nextInt(base.size)).split(" ").toBuffer
      (0 until 1 + rnd.nextInt(3)).foreach { _ =>
        toks(rnd.nextInt(toks.size)) = vocab(rnd.nextInt(vocab.size))
      }
      toks.mkString(" ")
    }
    rnd.shuffle(base ++ mutated)
  }

  test("prefix-filter pairs equal the all-pairs reference on random corpora, t in {0.3, 0.5, 0.8}") {
    for (seed <- Seq(7, 21); t <- Seq(0.3, 0.5, 0.8)) {
      val docs = docsOf(randomCorpus(seed, 24))
      val got = Dedup.jaccardPairs(docs, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = naivePairs(docs, t)
      assert(got === want, s"seed=$seed t=$t")
      if (t <= 0.5) assert(want.nonEmpty, s"fixture should plant near-dups (seed=$seed t=$t)")
    }
  }

  test("positional filter (r12) only shrinks the candidate relation; final pairs unchanged") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val docs = docsOf(randomCorpus(99, 40))
      def cands(positional: Boolean) =
        Dedup.jaccardCandidates(docs, t, positional)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val (pos, noPos) = (cands(true), cands(false))
      assert(pos.subsetOf(noPos), s"t=$t: positional filter ADDED candidates")
      def pairs(positional: Boolean) =
        Dedup.jaccardPairs(docs, t, positional)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pairs(true) === pairs(false), s"t=$t: positional filter changed the result")
      // every surviving candidate row must still cover every true pair
      assert(pairs(true).map(p => (p._1, p._2)).subsetOf(pos),
        s"t=$t: a qualifying pair lost its candidate row")
    }
  }
}
