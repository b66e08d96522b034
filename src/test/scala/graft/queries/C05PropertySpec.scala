package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** c05's rule battery against an independent in-memory reference on
  * random corpora — including the adversarial shapes the fixtures
  * never exercise (empty text, single tokens, all-stopword docs,
  * repeated-token degenerate TTR). The reference re-implements the
  * rules from the SPEC (tokenize = lowercase single-space split with
  * empties dropped), not from the kernels, so a kernel regression and
  * a rule regression are both visible.
  */
class C05PropertySpec extends SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "kappa", "lambda", "sigma", "omega", "x", "y", "zz",
    "hyperparameter", "regularization")
  private val stops = graft.functions.Text.stopwords("en")

  private def refRow(text: String): (Long, Long, Long) = {
    val tk = text.toLowerCase.split(" ", -1).filter(_.nonEmpty).toSeq
    val n = tk.size.toLong
    val dst = tk.distinct.size.toLong
    val len = tk.map(_.length.toLong).sum
    val nStop = tk.count(stops.contains).toLong
    val rWc = n >= 30 && n <= 100000
    val rMean = 3 * n <= len && len <= 10 * n
    val rStop = nStop >= 2
    val rTtr = 5 * dst >= n
    val bits = (if (rWc) 0L else 1L) + (if (rMean) 0L else 2L) +
      (if (rStop) 0L else 4L) + (if (rTtr) 0L else 8L)
    (n, bits, if (bits == 0L) 1L else 0L)
  }

  test("c05 rule bits match the in-memory reference on random + adversarial corpora") {
    val rnd = new scala.util.Random(41)
    def randomDoc(): String = {
      val pool = if (rnd.nextBoolean()) vocab ++ stops else vocab
      Seq.fill(1 + rnd.nextInt(60))(pool(rnd.nextInt(pool.size))).mkString(" ")
    }
    val texts = Seq("", "alpha", "the of", ("zz " * 40).trim,
      ("the be to of and " * 10).trim) ++ Seq.fill(60)(randomDoc())
    val dir = java.nio.file.Files.createTempDirectory("c05prop").toString
    spark.createDataFrame(texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", s"src${i % 3}", t.length.toLong)
      }).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("c05_gopher_rules")(spark, dir)
      .select("doc_id", "n_tokens", "fail_bits", "pass")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size === texts.size)
    texts.zipWithIndex.foreach { case (t, i) =>
      val exp = refRow(t)
      assert(got(i.toLong) === exp, s"doc $i (${t.take(40)}...): got ${got(i.toLong)}, expected $exp")
    }
    // sanity: the corpus must actually exercise both outcomes of every rule
    val allBits = got.values.map(_._2).toSet
    Seq(1L, 4L).foreach(b => assert(allBits.exists(v => (v & b) != 0), s"no doc fails bit $b"))
    assert(got.values.exists(_._3 == 1L), "no doc passes all rules")
  }
}
