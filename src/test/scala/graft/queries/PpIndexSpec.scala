package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted bucketed PPJoin base (r14 — the BandIndex treatment
  * for d02's index): pairs served from the index must equal the
  * in-query path row for row, and the candidate self-join on the
  * bucketed fingerprint must run with ZERO shuffle exchanges (the
  * recurring-cost-to-write-once conversion the layout exists for).
  */
class PpIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("indexed pairs == in-query pairs; candidate self-join is exchange-free") {
    val table = "ppjoin_base_spec"
    // drop catalog entry AND the warehouse directory: a prior JVM's run
    // leaves the directory behind with no entry in THIS session's
    // in-memory catalog, and saveAsTable refuses an existing location
    // (the BandIndexSpec reset)
    for (t <- Seq(table, table + "_df")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    }
    Dedup.buildPpIndex(spark, dir, table)

    def pmap(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val fresh = pmap(Dedup.jaccardPairs(Dedup.shingleDocs(spark, dir)))
    val indexed = pmap(Dedup.jaccardPairsIndexed(spark, table))
    assert(indexed.nonEmpty)
    assert(indexed === fresh, "indexed PPJoin diverged from the in-query path")

    // the candidate join reads both sides pre-partitioned + pre-sorted
    val cands = Dedup.prefixCands(
      graft.sources.PpIndex.read(spark, table), 0.5,
      positional = true, merge = true)
    val plan = cands.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"candidate self-join against the bucketed base must not shuffle:\n$plan")
  }

  test("interrupted compact swap (live dropped, _c present) heals on read") {
    import spark.implicits._
    val table = "ppjoin_swap_spec"
    for (t <- Seq(table, table + "_df", table + "_c")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    }
    val base = Seq((1L, 10L, 1, 2), (1L, 11L, 2, 2), (2L, 10L, 1, 1))
      .toDF("doc_id", "s", "rk", "n")
    graft.sources.PpIndex.write(base, table)
    // simulate the crash window between compact's drop and rename: the
    // compacted sibling exists, the live table does not
    spark.sql(s"ALTER TABLE $table RENAME TO ${table}_c")
    val rows = graft.sources.PpIndex.read(spark, table)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rows === Seq((1L, 10L), (1L, 11L), (2L, 10L)))
    assert(spark.catalog.tableExists(table) &&
      !spark.catalog.tableExists(table + "_c"))
  }
}
