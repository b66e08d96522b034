package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): seed-book vs Lloyd-trained
  * recall for v14's post-rebuild serving contract (r18, verdict ask
  * #4) — the fixture-tuning loop behind V14Floor. Prints hit counts
  * (of 10 queries × top-3) for both books at each driver SF.
  *
  *   sbt "Test/runMain graft.queries.V14Probe"
  */
object V14Probe {
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
      val e = Similarity.emb(spark, dir).localCheckpoint()
      val qPred = col("vec_id") >= 100 && col("vec_id") < 110
      val gt = Similarity.exactTopKOver(e, qPred, 3).localCheckpoint()
      val seedBook = Similarity.centroids(e, 16)
      val seed = Similarity.knnIvfOver(e, seedBook,
        Similarity.assignTo(e, seedBook).select("vec_id", "c_id", "v", "nrm"),
        qPred, 2)
      val trainedBook = Similarity.ivfTrainOver(spark, e, 16, 3)
      val trained = Similarity.knnIvfOver(e, trainedBook,
        Similarity.assignTo(e, trainedBook).select("vec_id", "c_id", "v", "nrm"),
        qPred, 2)
      println(s"[v14probe] sf=$sf seed=${hits(gt, seed)} " +
        s"trained=${hits(gt, trained)} of 30")
    }
    spark.stop()
  }
}
