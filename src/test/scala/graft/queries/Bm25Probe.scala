package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): the persisted BM25 index at the
  * 100× replica — build-once cost, then indexed serving vs the
  * two-corpus-pass in-query t14. The serving win is structural (read
  * ≤ k of 64 posting directories + the narrow doclens relation vs
  * tokenize the corpus twice); this probe prices it.
  *
  *   sbt "Test/runMain graft.queries.Bm25Probe [dir]"
  */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10salt")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def bench(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = Seq.fill(2)(time(
        df.write.format("noop").mode("overwrite").save()))
      println(f"[bm25probe] $tag: min ${ts.min}%.1fs (runs: ${ts.map(t => f"$t%.1f").mkString(", ")})")
    }
    val path = Similarity.scratchPath("bm25bench", dir)
    val tBuild = time(TextAnalysis.buildBm25Index(spark, dir, path))
    println(f"[bm25probe] index build: $tBuild%.1fs")
    val qterms = Seq("dup", "vector", "spark")
    bench("in-query t14 (two corpus passes)")(
      graft.SparkEntry.queries("t14_bm25_search")(spark, dir))
    bench("indexed serve")(
      TextAnalysis.bm25Indexed(spark, path, qterms))
    // r16: the production dial — rank matched docs only, dropping the
    // corpus-sized doclens left join that exists for t14 parity
    bench("indexed serve, matchedOnly dial")(
      TextAnalysis.bm25Indexed(spark, path, qterms, matchedOnly = true))
    // the dial's regime is SELECTIVE queries (t14's fixture terms are
    // corpus-common, so matched ≈ corpus and the dial is neutral):
    // 'dup' matches ~5% of docs
    val rare = Seq("dup")
    bench("indexed serve, rare term, full ranking")(
      TextAnalysis.bm25Indexed(spark, path, rare))
    bench("indexed serve, rare term, matchedOnly dial")(
      TextAnalysis.bm25Indexed(spark, path, rare, matchedOnly = true))
    spark.stop()
  }
}
