package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): the PPJoin-base append path's
  * cost and FILTER-POWER STALENESS at the 100× dup-dense replica
  * (r15, verdict ask #2). For each appended fraction: append cost vs
  * full rebuild, candidate volume through the stale frozen-rank
  * prefixes vs the rebuilt index, pair-count/jaccard-checksum
  * agreement (the fixture sits far under the df cap, so results must
  * match exactly — only candidate VOLUME may drift).
  *
  *   sbt "Test/runMain graft.queries.PpAppendProbe [dir]"
  */
object PpAppendProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10dup")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def reset(table: String): Unit =
      for (t <- Seq(table, table + "_df")) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val wh = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), t)
        wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
      }
    def summary(table: String): (Long, Long, Long) = {
      val cands = Dedup.prefixCands(graft.sources.PpIndex.read(spark, table),
        0.5, positional = true, merge = true)
      val nc = cands.count()
      val r = Dedup.jaccardPairsIndexed(spark, table)
        .agg(count(lit(1)).as("np"),
          sum(floor(col("jaccard") * lit(1000000.0)).cast("long")).as("ck"))
        .head()
      (nc, r.getLong(0), r.getLong(1))
    }

    val docs = Dedup.shingleDocs(spark, dir).localCheckpoint(eager = false)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)

    reset("ppx_full")
    val (_, tFull) = time(Dedup.buildPpIndexOver(spark, docs, "ppx_full"))
    val ((cF, pF, kF), tServeF) = time(summary("ppx_full"))
    println(f"[ppappendprobe] full rebuild: build $tFull%.1fs, serve $tServeF%.1fs, " +
      s"cands=$cF pairs=$pF ck=$kF")

    for (frac <- Seq(0.10, 0.25)) {
      val cut = (maxId * (1.0 - frac)).toLong
      val table = s"ppx_a${(frac * 100).toInt}"
      reset(table)
      val (_, tBuild) = time(
        Dedup.buildPpIndexOver(spark, docs.filter(col("doc_id") <= cut), table))
      val (_, tApp) = time(
        Dedup.appendToPpIndex(spark, table, docs.filter(col("doc_id") > cut)))
      val ((c, p, k), tServe) = time(summary(table))
      val ok = p == pF && k == kF
      println(f"[ppappendprobe] append ${(frac * 100).toInt}%%: base-build $tBuild%.1fs, " +
        f"APPEND $tApp%.1fs, serve $tServe%.1fs, cands=$c (${c.toDouble / cF}%.3fx full), " +
        s"pairs=$p ck=$k resultsEqualFull=$ok")
      // attribute any divergence: fps whose df crosses the MaxDf cap
      // between the build subset and the full corpus judge under the
      // frozen (smaller) universe after an append — the documented
      // contract boundary. Count them and their full-corpus postings.
      val ex = docs.select(col("doc_id"),
        explode(array_distinct(graft.functions.Text.fps(col("sh")))).as("s"))
      val dfFull = ex.groupBy("s").agg(count(lit(1)).as("dfF"))
      val dfBuild = ex.filter(col("doc_id") <= cut)
        .groupBy("s").agg(count(lit(1)).as("dfB"))
      val cross = dfBuild.join(dfFull, "s")
        .filter(col("dfB") <= 50 && col("dfF") > 50)
        .agg(count(lit(1)).as("nfp"), sum(col("dfF")).as("postings")).head()
      println(s"[ppappendprobe]   cap-crossers at ${(frac * 100).toInt}%: " +
        s"${cross.getLong(0)} fps (${if (cross.isNullAt(1)) 0L else cross.getLong(1)} full-corpus postings) " +
        "kept by the frozen universe but dropped by a rebuild")
    }
    spark.stop()
  }
}
