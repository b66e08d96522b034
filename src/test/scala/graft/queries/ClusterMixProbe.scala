package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): seed-book vs Lloyd-trained
  * recall on the planted clustered mixture (r17, verdict stretch #8) —
  * the fixture-tuning loop behind the v13 gate's floors. Prints hit
  * counts (of n_q × 3) for both books at each driver SF.
  *
  *   sbt "Test/runMain graft.queries.ClusterMixProbe"
  */
object ClusterMixProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def hits(gt: DataFrame, ap: DataFrame): Long =
      gt.select("q_id", "neighbor_id")
        .join(ap.select("q_id", "neighbor_id"),
          Seq("q_id", "neighbor_id"), "left_semi")
        .count()

    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val e = Similarity.clusteredEmb(spark, dir).localCheckpoint()
      val qPred = col("vec_id") >= 300 && col("vec_id") < 330
      val gt = Similarity.exactTopKOver(e, qPred, 3).localCheckpoint()
      for (nprobe <- Seq(2, 4)) {
        val seedBook = Similarity.centroids(e, 16)
        val seed = Similarity.knnIvfOver(e, seedBook,
          Similarity.assignTo(e, seedBook).select("vec_id", "c_id", "v", "nrm"),
          qPred, nprobe)
        val trainedBook = Similarity.ivfTrainOver(spark, e, 16, 3)
        val trained = Similarity.knnIvfOver(e, trainedBook,
          Similarity.assignTo(e, trainedBook).select("vec_id", "c_id", "v", "nrm"),
          qPred, nprobe)
        println(s"[clustermix] sf=$sf nprobe=$nprobe " +
          s"seed=${hits(gt, seed)} trained=${hits(gt, trained)} of 90")
      }
    }
    spark.stop()
  }
}
