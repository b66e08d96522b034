package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Vectors._

/** Dev measurement main (test scope): the v06 bucket join at the 100x
  * replica across forced salt values — what the width-aware bucketSalt
  * plan costs when it actually salts (on a wide cluster), measured on
  * this box by forcing the dial. Interleaved passes, noop sink.
  *
  *   sbt "Test/runMain graft.queries.BlockSaltProbe target/scaled/sf10salt"
  */
object BlockSaltProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10salt")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val e = Similarity.emb(spark, dir).withColumn("bucket", lshBucket(col("v")))
    val a0 = e.select(col("bucket"), col("vec_id").as("a_id"),
      col("v").as("va"), col("nrm").as("na"))
    val b0 = e.select(col("bucket"), col("vec_id").as("b_id"),
      col("v").as("vb"), col("nrm").as("nb"))
    def run(salt: Int): Unit = {
      val (a, b, keys) = Similarity.saltSides(a0, b0, col("b_id"), Seq("bucket"), salt)
      a.join(b, keys).filter(col("a_id") < col("b_id"))
        .select(col("bucket"), col("a_id"), col("b_id"),
          (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
        .filter(col("cosine") >= 0.3)
        .write.format("noop").mode("overwrite").save()
    }
    run(1) // warm-up
    for (pass <- 1 to 2; salt <- Seq(1, 8, 32)) {
      val t = time(run(salt))
      println(f"[blocksalt] pass=$pass salt=$salt wall=$t%.1fs")
    }
    spark.stop()
  }
}
