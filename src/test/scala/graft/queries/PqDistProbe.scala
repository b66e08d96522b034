package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): BATCH serving cost of the
  * distributed PQ/IVFADC query side vs the driver-materialized path
  * (r15, verdict ask #3) at the 100× replica — n_q = 10k queries
  * against the production-dial index (nlist = 256, nprobe = 8 → 3.1%
  * of the codes probed per query). Both paths produce row-identical
  * results (PqDistServeSpec); this probe prices them.
  *
  *   sbt "Test/runMain graft.queries.PqDistProbe [dir]"
  */
object PqDistProbe {
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
      println(f"[pqdistprobe] $tag: min ${ts.min}%.1fs (runs: ${ts.map(t => f"$t%.1f").mkString(", ")})")
    }
    val path = Similarity.scratchPath("pqdistbench", dir)
    val tBuild = time(Similarity.buildIvfAdcIndex(spark, dir, path,
      m = 16, k = 16, nlist = 256))
    println(f"[pqdistprobe] IVFADC build (nlist=256): $tBuild%.1fs")
    for (nq <- Seq(10, 10000)) {
      val qPred = col("vec_id") < nq
      bench(s"driver  serve n_q=$nq")(
        Similarity.ivfAdcServe(spark, dir, path, 8, 100, qPred))
      bench(s"dist    serve n_q=$nq")(
        Similarity.ivfAdcServeDist(spark, dir, path, 8, 100, qPred))
    }
    spark.stop()
  }
}
