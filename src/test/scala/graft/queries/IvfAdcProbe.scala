package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): the IVFADC dial sweep the
  * SCALE.md design note deferred — recall@3 hit counts (of 30) per SF
  * across residual-vs-direct codebooks × nprobe × frontier, through
  * the EXACT v12 pipeline (Similarity.ivfAdcTop3, no index write).
  * The numbers behind V12Nprobe / V12Floor; table in BENCHNOTES r14.
  *
  *   sbt "Test/runMain graft.queries.IvfAdcProbe"
  */
object IvfAdcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qPred = col("vec_id") >= 300 && col("vec_id") < 310
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val gt = Similarity.exactTopKWhere(spark, dir, qPred, 3)
        .select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // trained coarse book: the routing-quality dial — the fixtures
      // are routing-bound, so this is where recall headroom lives
      val trained = Similarity.ivfTrain(spark, dir, nlist = 16, iters = 3)
      for (trainedCoarse <- Seq(false, true);
           residual <- Seq(true, false); nprobe <- Seq(2, 4, 8);
           frontier <- Seq(50, 100)) {
        val top3 = Similarity.ivfAdcTop3(spark, dir, m = 16, k = 16,
            nprobe = nprobe, frontier = frontier, qPred = qPred,
            residual = residual,
            coarse = if (trainedCoarse) Some(trained) else None)
          .select("q_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val hits = gt.intersect(top3).size
        println(s"[ivfadcprobe] sf=$sf coarse=${if (trainedCoarse) "trained" else "seed"} " +
          s"residual=$residual nprobe=$nprobe frontier=$frontier hits=$hits/30")
      }
    }
    spark.stop()
  }
}
