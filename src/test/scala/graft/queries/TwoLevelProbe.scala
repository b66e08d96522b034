package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev measurement main (test scope, not part of the engine): seed vs
  * TRAINED super-router match rates for the two-level IVF multi-probe
  * dial, per gate SF — the r13 verdict-ask-#5 line (and the evidence
  * behind V10bFloor).
  *
  *   sbt "Test/runMain graft.queries.TwoLevelProbe"
  */
object TwoLevelProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val e = Similarity.emb(spark, dir)
      val fine = Similarity.centroids(e, 64)
      val single = Similarity.assignTo(e, fine)
        .select("vec_id", "c_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (trained <- Seq(false, true); w <- Seq(1, 2, 4)) {
        val two = Similarity.twoLevelAssign(spark, dir, fine, w, trained)
          .select("vec_id", "c_id").collect()
        val m = two.count { r => single(r.getLong(0)) == r.getLong(1) }
        println(f"[twolevel] dir=$dir trained=$trained w=$w " +
          f"match=${m.toDouble / two.length}%.4f n=${two.length}%d")
      }
    }
    spark.stop()
  }
}
