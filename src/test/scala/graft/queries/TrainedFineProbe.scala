package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): the TRAINED-fine two-level build
  * (r14, verdict ask #3) — per data dir, builds the seed-fine and the
  * trained-fine sharded indexes side by side and reports
  *
  *   - the SHARD-SIZE distribution (min/mean/max fine-centroid members
  *     per s_id) each build produces — the shuffle_hash join in the
  *     sharded path partitions on s_id, so this spread bounds its
  *     reducer skew at the production tier;
  *   - the w=2 match fraction against the single-level argmax over the
  *     SAME book (the v10d gate's frac contract — the number behind
  *     V10dFloor), plus the seed-book rate for the delta line;
  *   - build and assignment wall times.
  *
  *   sbt "Test/runMain graft.queries.TrainedFineProbe [dir ...]"
  */
object TrainedFineProbe {
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
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    for (dir <- dirs) {
      val base = java.nio.file.Files.createTempDirectory("trainedfine").toString
      for (trained <- Seq(false, true)) {
        val path = s"$base/${if (trained) "trained" else "seed"}/idx"
        val (_, tBuild) = time(
          if (trained) Similarity.buildTwoLevelIndexTrained(spark, dir, path, 64)
          else Similarity.buildTwoLevelIndex(spark, dir, path, 64))
        val sizes = graft.sources.IvfIndex.fineShards(spark, path)
          .groupBy("s_id").agg(count(lit(1)).as("n"))
          .agg(min("n"), avg("n"), max("n"), count(lit(1))).head()
        val e = Similarity.emb(spark, dir)
        val single = Similarity.assignTo(e,
            graft.sources.IvfIndex.fineShards(spark, path).select("c_id", "cv", "cn"))
          .select("vec_id", "c_id").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val (two, tAssign) = time(
          Similarity.twoLevelAssignSharded(spark, dir, path, w = 2)
            .select("vec_id", "c_id").collect())
        val m = two.count(r => single(r.getLong(0)) == r.getLong(1))
        println(f"[trainedfine] dir=$dir trained=$trained build=$tBuild%.1fs " +
          f"shards=${sizes.getLong(3)}%d sizes(min/mean/max)=" +
          f"${sizes.getLong(0)}%d/${sizes.getDouble(1)}%.1f/${sizes.getLong(2)}%d " +
          f"w2_match=${m.toDouble / two.length}%.4f n=${two.length}%d assign_w2=$tAssign%.1fs")
      }
      new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
    }
    spark.stop()
  }
}
