package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope, not part of the engine): the
  * sharded two-level path at the 100x replica — the r13
  * verdict-ask-#2 BENCHNOTES line. Builds the persisted sharded index
  * once (off the query path, like IvfIndex training), then interleaves
  * the broadcast prototype vs the persisted sharded join at w=2 and
  * w=nSup, checking row-identical results while timing each.
  *
  *   sbt "Test/runMain graft.queries.TwoLevelScaleProbe target/scaled/sf10salt"
  */
object TwoLevelScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10salt")
    val nlist = args.lift(1).flatMap(_.toIntOption).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val path = java.nio.file.Files
      .createTempDirectory("twolevel-scale").toString + "/idx"
    val (_, tBuild) = time(Similarity.buildTwoLevelIndex(spark, dir, path, nlist))
    println(f"[twolevelscale] dir=$dir nlist=$nlist build=$tBuild%.1fs")
    val fine = Similarity.centroids(Similarity.emb(spark, dir), nlist)
    val nSup = math.ceil(math.sqrt(nlist.toDouble)).toInt
    for (pass <- 1 to 2; w <- Seq(2, nSup)) {
      val (nb, tb) = time(
        Similarity.twoLevelAssign(spark, dir, fine, w, trainedRouter = true)
          .write.format("noop").mode("overwrite").save())
      val (ns, ts) = time(
        Similarity.twoLevelAssignSharded(spark, dir, path, w)
          .write.format("noop").mode("overwrite").save())
      val diff = Similarity.twoLevelAssign(spark, dir, fine, w, trainedRouter = true)
        .exceptAll(Similarity.twoLevelAssignSharded(spark, dir, path, w))
        .count()
      println(f"[twolevelscale] pass=$pass w=$w broadcast=$tb%.1fs " +
        f"sharded=$ts%.1fs except_diff=$diff%d")
    }
    spark.stop()
    new scala.reflect.io.Directory(
      new java.io.File(path).getParentFile).deleteRecursively()
  }
}
