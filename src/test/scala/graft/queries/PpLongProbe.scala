package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (test scope): the PPJoin/dedup family priced
  * at realistic document lengths (r18, verdict ask #2) — the same
  * regime graduation the BM25 family got in r17. All prior d02
  * readings were taken at ~54-token docs; shingle volume, prefix
  * lengths, and the df-cap economics all scale with text length, so
  * this prices the family on BOTH 100× replicas:
  *
  *   - corpus shape: docs, shingle rows (pre-cap), base rows kept by
  *     the df cap, prefix rows (the candidate join's input);
  *   - index build cost (one corpus pass into the bucketed table);
  *   - drift probe: fps whose CURRENT df crossed the frozen cap;
  *   - serve latency: inline jaccardPairs vs the persisted-index
  *     jaccardPairsIndexed, min of 2, noop sink.
  *
  *   sbt "Test/runMain graft.queries.PpLongProbe [dir]"
  */
object PpLongProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled/sf10long")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.Text.tokenStats(col("text")).getField("_1").as("n_tokens"),
        graft.functions.Text.distinctShingles(col("text")).as("sh"))
      .localCheckpoint()

    val shape = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(col("sh"))).as("sh_rows"),
      avg(col("n_tokens")).as("avg_tokens")).head()
    println(f"[pplongprobe] $dir: docs=${shape.getLong(0)}%,d " +
      f"shingle_rows=${shape.getLong(1)}%,d avg_tokens=${shape.getDouble(2)}%.0f")

    val table = "pplong_" + java.lang.Integer.toHexString(dir.hashCode)
    val tBuild = time(Dedup.buildPpIndexOver(spark, docs, table))
    val base = graft.sources.PpIndex.read(spark, table)
    // the t=0.5 prefix predicate, verbatim from prefixCands
    val baseStats = base.agg(count(lit(1)).as("rows"),
      sum(when(col("rk") <= col("n") - ceil(col("n") * 0.5).cast("int") + 1,
        1L).otherwise(0L)).as("prefix_rows"))
      .head()
    println(f"[pplongprobe] build=$tBuild%.1fs base_rows=${baseStats.getLong(0)}%,d " +
      f"(capped from ${shape.getLong(1)}%,d), prefix_rows=${baseStats.getLong(1)}%,d")

    val drift = Dedup.ppIndexDrift(spark, table).head()
    println(s"[pplongprobe] drift: ${drift.toString}")

    val tIdx = Seq.fill(2)(time(
      Dedup.jaccardPairsIndexed(spark, table)
        .write.format("noop").mode("overwrite").save())).min
    val tInline = Seq.fill(2)(time(
      Dedup.jaccardPairs(docs, t = 0.5)
        .write.format("noop").mode("overwrite").save())).min
    val nPairs = Dedup.jaccardPairsIndexed(spark, table).count()
    println(f"[pplongprobe] serve: inline=$tInline%.1fs indexed=$tIdx%.1fs " +
      f"pairs=$nPairs%,d")

    // verify-stage decomposition (r19, verdict ask #2 — only
    // meaningful on a replica with a NONZERO qualifying-pair relation,
    // i.e. sf10longsalt): candidate volume after prefix+length+
    // positional, the counting join's input rows (base restricted to
    // candidate docs), and the candidate-stage-only wall — verify cost
    // = full serve minus this.
    val cands = Dedup.prefixCands(base, 0.5, positional = true,
      merge = true).distinct().localCheckpoint()
    val tCand = Seq.fill(2)(time(
      Dedup.prefixCands(base, 0.5, positional = true, merge = true)
        .distinct()
        .write.format("noop").mode("overwrite").save())).min
    val nCand = cands.count()
    val candDocs = cands.select(col("doc_id"))
      .union(cands.select(col("doc_id2"))).distinct()
    val nVerifyRows = base.join(candDocs, Seq("doc_id"), "left_semi").count()
    println(f"[pplongprobe] verify decomposition: cand_pairs=$nCand%,d " +
      f"cand_docs=${candDocs.count()}%,d verify_input_rows=$nVerifyRows%,d " +
      f"cand_stage=$tCand%.1fs (verify ~= indexed - cand_stage = " +
      f"${tIdx - tCand}%.1fs)")
    spark.stop()
  }
}
