package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope, not part of the engine) for the
  * r12 IVF work at the scaled corpus:
  *
  *  1. seed vs TRAINED recall@3 at equal nprobe through the persisted
  *     index (verdict ask #3's 100x line) — same 100-query slice,
  *     one shared brute-force ground truth;
  *  2. single-level kernel assignment vs the two-level prototype
  *     (coarse route + shard argmax) at the √n dial — wall min-of-2
  *     and exact-assignment match rate by probe width w.
  *
  *   sbt "Test/runMain graft.queries.IvfScaleProbe target/scaled/sf10salt"
  */
object IvfScaleProbe {
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

    val e = Similarity.emb(spark, dir)
    val n = e.count()
    println(s"[ivfprobe] corpus vectors: $n")

    // ---- 1. seed vs trained recall at equal nprobe --------------------
    val qPred = col("vec_id") >= 100 && col("vec_id") < 200
    val (exact, tExact) = time {
      val df = Similarity.exactTopKWhere(spark, dir, qPred, 3)
        .select("q_id", "neighbor_id").localCheckpoint(eager = false)
      df.count(); df
    }
    println(f"[ivfprobe] brute-force ground truth (100 queries): $tExact%.1fs")
    def recall(tag: String, ann: org.apache.spark.sql.DataFrame): Unit = {
      val (r, t) = time(Similarity.recallOf(tag, exact, ann)
        .select("n_queries", "n_hits").head())
      println(f"[ivfprobe] $tag%-8s recall@3 = ${r.getLong(1)}%d/${3 * r.getLong(0)}%d " +
        f"(${r.getLong(1).toDouble / (3 * r.getLong(0))}%.3f), query wall $t%.1fs")
    }
    def clusterStats(tag: String, assign: org.apache.spark.sql.DataFrame): Unit = {
      val s = assign.groupBy("c_id").agg(count(lit(1)).as("cn"))
        .agg(min("cn"), max("cn"), avg("cn")).head()
      println(f"[ivfprobe] $tag%-8s cluster sizes: min ${s.getLong(0)}%d " +
        f"max ${s.getLong(1)}%d avg ${s.getDouble(2)}%.0f")
    }
    val seedAssign = Similarity.ivfAssign(spark, dir, 16)
    clusterStats("seed", seedAssign)
    recall("seed", Similarity.knnIvfOver(e, Similarity.centroids(e, 16),
      seedAssign, qPred, nprobe = 2))
    val path = java.nio.file.Files.createTempDirectory("ivfidx100x").toString + "/index"
    val (_, tTrain) = time(
      Similarity.buildTrainedIndex(spark, dir, path, nlist = 16, iters = 3))
    println(f"[ivfprobe] train(nlist=16, iters=3) + persist: $tTrain%.1fs")
    clusterStats("trained", graft.sources.IvfIndex.read(spark, path))
    recall("trained", Similarity.knnIvfIndexed(spark, dir, path, qPred, nprobe = 2))

    // ---- 2. single-level kernel vs two-level prototype at √n ----------
    val nlist = math.ceil(math.sqrt(n.toDouble)).toInt
    val fine = Similarity.centroids(e, nlist)
      .localCheckpoint(eager = false)
    println(s"[ivfprobe] sqrt-n dial: nlist=$nlist")
    for (pass <- 1 to 2) {
      val (_, tSingle) = time(Similarity.assignTo(e, fine)
        .select("vec_id", "c_id", "c_cos")
        .write.format("noop").mode("overwrite").save())
      println(f"[ivfprobe] pass=$pass single-level kernel assign: $tSingle%.1fs")
    }
    val single = Similarity.assignTo(e, fine).select("vec_id", "c_id")
    for (w <- Seq(2, 4); pass <- 1 to 2) {
      val (_, tTwo) = time(Similarity.twoLevelAssign(spark, dir, fine, w)
        .write.format("noop").mode("overwrite").save())
      println(f"[ivfprobe] pass=$pass two-level w=$w assign: $tTwo%.1fs")
      if (pass == 2) {
        val two = Similarity.twoLevelAssign(spark, dir, fine, w)
          .select(col("vec_id"), col("c_id").as("c2"))
        val m = single.join(two, "vec_id")
          .agg(count(lit(1)).as("n"),
            sum(when(col("c_id") === col("c2"), 1L).otherwise(0L)).as("match"))
          .head()
        println(f"[ivfprobe] w=$w exact-assignment match: ${m.getLong(1)}%d/${m.getLong(0)}%d " +
          f"(${m.getLong(1).toDouble / m.getLong(0)}%.3f)")
      }
    }
    spark.stop()
  }
}
