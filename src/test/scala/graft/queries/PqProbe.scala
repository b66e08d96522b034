package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PqCodebook
import graft.functions.Vectors._

/** Dev measurement main (test scope): raw PQ-ADC recall@3 hit counts
  * (out of 30) per SF and frontier width — the numbers behind
  * V11Floor. Mirrors v11's pipeline exactly.
  *
  *   sbt "Test/runMain graft.queries.PqProbe"
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.01", "0.1"); frontier <- Seq(50); (m, k) <- Seq((8, 16), (8, 32), (16, 16))) {
      val dir = s"/root/testdata/sf$sf"
      val e = Similarity.emb(spark, dir)
      def unit(r: org.apache.spark.sql.Row): Array[Double] = Similarity.unitRow(r)
      // v11's sample: hash-stratified (r14, ask #5) — SPARK_GRAFT_PQ_PREFIX=1
      // measures the old id-prefix sample for the recall A/B line
      val sampleRows =
        if (sys.env.get("SPARK_GRAFT_PQ_PREFIX").contains("1"))
          e.filter(col("vec_id") < 256).orderBy("vec_id")
            .select(col("vec_id"), col("v"), col("nrm")).collect()
        else Similarity.pqSampleRows(e)
      val cb = PqCodebook.train(sampleRows.map(unit).toSeq, m, k)
      val qRows = e.filter(col("vec_id") >= 300 && col("vec_id") < 310)
        .orderBy("vec_id").select(col("vec_id"), col("v"), col("nrm")).collect()
      val luts = PqCodebook.luts(cb, qRows.map(unit).toSeq, m, k)
      import spark.implicits._
      val qIdx = broadcast(qRows.map(_.getLong(0)).zipWithIndex
        .map { case (q, i) => (q, i) }.toSeq.toDF("q_id", "q_idx"))
      val codes = e.select(col("vec_id"),
        pqEncode(col("v"), col("nrm"), cb, m, k).as("pq"))
      val candW = Window.partitionBy(col("q_id"))
        .orderBy(col("adc").desc, col("neighbor_id"))
      val cands = codes.crossJoin(qIdx).filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          pqAdc(col("q_idx"), col("pq"), luts, m, k).as("adc"))
        .withColumn("crk", row_number().over(candW)).filter(col("crk") <= frontier)
        .select("q_id", "neighbor_id")
      val gt = Similarity.exactTopKWhere(spark, dir,
        col("vec_id") >= 300 && col("vec_id") < 310, 3)
      val nh = gt.select("q_id", "neighbor_id")
        .join(cands, Seq("q_id", "neighbor_id"), "left_semi").count()
      println(s"[pqprobe] sf=$sf frontier=$frontier m=$m k=$k hits=$nh/30")
    }
    spark.stop()
  }
}
