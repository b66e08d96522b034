package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text
import graft.sources.IvfIndex

/** Dev measurement main (test scope, not part of the engine) for the
  * r12 scaled-replica probes:
  *
  *  1. x04 cost decomposition — scan+count materialization vs the
  *     weighted-CMS fold vs the top-10+probe tail, against the full
  *     gated query wall.
  *  2. Trained vs seed IVF recall through the PERSISTED index path at
  *     the production √n dial, equal nprobe (the BENCHNOTES line the
  *     round-11 verdict asked for).
  *
  *   sbt "Test/runMain graft.queries.ScaleProbe target/scaled/sf10salt"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10salt")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- 1. x04 decomposition ----
    for (pass <- 1 to 2) {
      val eps = 0.001
      val counts = Tables(spark, dir, "documents")
        .select(explode(Text.shinglesAll(col("text"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("exact_n"))
        .localCheckpoint(eager = false)
      val (nVocab, tCount) = time(counts.count())
      val (row, tSketch) = time(counts.agg(
        graft.functions.CmsWeighted(col("bigram"), col("exact_n"), eps, 0.99, 42).as("cms"),
        sum(col("exact_n")).as("n")).first())
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
      val (_, tTop) = time(counts
        .orderBy(col("exact_n").desc, col("bigram")).limit(10)
        .select(col("bigram"), col("exact_n"),
          graft.functions.SketchProbes.cmsEstimate(col("bigram"), cms).as("est"))
        .collect())
      counts.unpersist()
      // the gated query's two phases: the closure call runs the
      // agg.first() (materializes its own checkpoint + folds the CMS);
      // the write then runs the top-10 + probe over the checkpoint
      val (qdf, tBuild) = time(TextAnalysis.queries("x04_cms_heavy_hitters")(spark, dir))
      val (_, tWrite) = time(qdf.write.format("noop").mode("overwrite").save())
      println(f"[x04probe] pass=$pass vocab=$nVocab%d count_pass=$tCount%.1fs " +
        f"cms_fold=$tSketch%.1fs top10_probe=$tTop%.1fs " +
        f"query_build=$tBuild%.1fs query_write=$tWrite%.1fs")
    }

    // ---- 2. IVF: trained vs seed recall, persisted path, sqrt(n) dial ----
    val e = Similarity.emb(spark, dir)
    val n = e.count()
    val nlist = math.ceil(math.sqrt(n.toDouble)).toInt
    val tmp = java.nio.file.Files.createTempDirectory("ivfscale").toString
    val (_, tSeed) = time(IvfIndex.writeWithCodebook(
      Similarity.ivfAssign(spark, dir, nlist),
      Similarity.centroids(e, nlist), s"$tmp/seed"))
    val (_, tTrain) = time(
      Similarity.buildTrainedIndex(spark, dir, s"$tmp/trained", nlist, iters = 2))
    val qPred = col("vec_id") >= 100 && col("vec_id") < 110
    val exact = Similarity.exactTopKWhere(spark, dir, qPred, 3)
      .select("q_id", "neighbor_id").cache()
    exact.count()
    for (nprobe <- Seq(1, 2, 4, 8)) {
      def hits(path: String): (Long, Double) = {
        val (h, t) = time(Similarity.recallOf("x", exact,
          Similarity.knnIvfIndexed(spark, dir, path, qPred, nprobe))
          .select("n_hits").head().getLong(0))
        (h, t)
      }
      val (seedHits, tSeedQ) = hits(s"$tmp/seed")
      val (trainedHits, tTrainQ) = hits(s"$tmp/trained")
      println(f"[ivfprobe] n=$n%d nlist=$nlist%d nprobe=$nprobe%d " +
        f"seed_build=$tSeed%.1fs trained_build=$tTrain%.1fs " +
        f"seed_hits=$seedHits%d/30 (query $tSeedQ%.1fs) " +
        f"trained_hits=$trainedHits%d/30 (query $tTrainQ%.1fs)")
    }
    // dev-probe hygiene (ADVICE r12): release the JVM state and the
    // throwaway index dirs so repeated probe runs don't accumulate
    spark.stop()
    import scala.reflect.io.Directory
    new Directory(new java.io.File(tmp)).deleteRecursively()
  }
}
