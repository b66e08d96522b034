package graft.queries

import org.apache.spark.sql.{GraftSqlBridge, SparkSessionExtensions}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** c04's hashed-linear-classifier kernel: reference parity, null/empty
  * behavior, SQL registration, and the fixture-level sanity that the
  * filter actually separates (keeps a strict subset).
  */
class ClassifierFilterSpec extends SparkSpec {

  private def refScore(text: String, d: Int = 256): Long =
    text.toLowerCase.split(" ").filter(_.nonEmpty)
      .map { t =>
        val j = graft.functions.Text.charFpStr(t) % d
        (j * 1103515245L + 12345L) % 2001L - 1000L
      }.sum

  test("kernel matches the reference fold on random texts") {
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(40))("tok" + rnd.nextInt(50)).mkString(" ")
      assert(graft.functions.Text.classifierScoreStr(text, 256) == refScore(text))
    }
    assert(graft.functions.Text.classifierScoreStr("", 256) == 0L)
    assert(graft.functions.Text.classifierScoreStr("   ", 256) == 0L)
  }

  test("frequency weighting: a repeated token scores k times its weight") {
    val one = graft.functions.Text.classifierScoreStr("alpha", 256)
    assert(graft.functions.Text.classifierScoreStr("alpha alpha alpha", 256) == 3 * one)
  }

  test("graft_classifier is callable from SQL and matches the column form") {
    val ext = new SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    GraftSqlBridge.registerFunctions(ext, spark)
    val viaSql = spark.sql("SELECT graft_classifier('big data table scan') AS s")
      .head.getLong(0)
    assert(viaSql == graft.functions.Text.classifierScoreStr("big data table scan", 256))
  }

  test("fixture: the filter separates — keeps a strict non-empty subset") {
    val out = graft.SparkEntry.queries("c04_classifier_filter")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val (docs, kept) = (out.map(_.getLong(1)).sum, out.map(_.getLong(2)).sum)
    assert(kept > 0 && kept < docs,
      s"degenerate classifier: kept $kept of $docs")
  }
}
