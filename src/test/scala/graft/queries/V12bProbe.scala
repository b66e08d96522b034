package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): recall@3 of the v12b gate path
  * EXACTLY as gated — trained-coarse IVFADC built through
  * buildIvfAdcIndex(coarse = Some(ivfTrain)) and served from the
  * persisted index — vs v12's seed-book path, per SF. The numbers
  * behind V12bFloor; table in BENCHNOTES r15.
  *
  *   sbt "Test/runMain graft.queries.V12bProbe"
  */
object V12bProbe {
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
      def hits(df: org.apache.spark.sql.DataFrame): Int =
        gt.intersect(df.select("q_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet).size
      val seed = Similarity.ivfAdcTop3(spark, dir, m = 16, k = 16,
        nprobe = Similarity.V12Nprobe, frontier = Similarity.V12Frontier,
        qPred = qPred, residual = true,
        indexPath = Some(Similarity.scratchPath("v12", dir)))
      val p = Similarity.scratchPath("v12b", dir)
      Similarity.buildIvfAdcIndex(spark, dir, p, m = 16, k = 16,
        nlist = 16, coarse = Some(Similarity.ivfTrain(spark, dir, nlist = 16)))
      val trained = Similarity.ivfAdcServe(spark, dir, p,
        Similarity.V12Nprobe, Similarity.V12Frontier, qPred)
      println(s"[v12bprobe] sf=$sf v12_seed=${hits(seed)}/30 " +
        s"v12b_trained=${hits(trained)}/30 floor=${Similarity.V12bFloor}")
    }
    spark.stop()
  }
}
