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

  private def wipe(table: String, extra: String*): Unit = {
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    // generation tables + the pointer dir from prior JVM runs
    val whPath = new org.apache.hadoop.fs.Path(wh)
    if (fs.exists(whPath))
      fs.listStatus(whPath).map(_.getPath.getName)
        .filter(n => n == table || n.startsWith(table + "_"))
        .foreach { n =>
          spark.sql(s"DROP TABLE IF EXISTS $n")
          fs.delete(new org.apache.hadoop.fs.Path(wh, n), true)
        }
    extra.foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS $n")
      fs.delete(new org.apache.hadoop.fs.Path(wh, n), true)
    }
  }

  test("legacy flat artifact: interrupted pre-r17 swap (_c present) heals on read") {
    import spark.implicits._
    val table = "ppjoin_swap_spec"
    wipe(table)
    val base = Seq((1L, 10L, 1, 2), (1L, 11L, 2, 2), (2L, 10L, 1, 1))
      .toDF("doc_id", "s", "rk", "n")
    // a PRE-R17 artifact: flat bucketed table, no pointer
    graft.sources.Bucketing.writeBucketed(base, table, "s")
    // simulate the old compact's crash window between its drop and
    // rename: the compacted sibling exists, the live table does not
    spark.sql(s"ALTER TABLE $table RENAME TO ${table}_c")
    val rows = graft.sources.PpIndex.read(spark, table)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rows === Seq((1L, 10L), (1L, 11L), (2L, 10L)))
    assert(spark.catalog.tableExists(table) &&
      !spark.catalog.tableExists(table + "_c"))
  }

  test("a reader pinned pre-compact survives the swap; fresh reads see the new generation") {
    import spark.implicits._
    val table = "ppjoin_reader_spec"
    wipe(table)
    val base = Seq((1L, 10L, 1, 2), (1L, 11L, 2, 2), (2L, 10L, 1, 1))
      .toDF("doc_id", "s", "rk", "n")
    graft.sources.PpIndex.write(base, table)
    // append so the compact has something to merge
    graft.sources.PpIndex.append(
      Seq((3L, 11L, 1, 1)).toDF("doc_id", "s", "rk", "n"), spark, table)

    def rowset(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "s").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val all = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 11L))

    // reader A resolves the LIVE generation's files now
    val pinned = graft.sources.PpIndex.read(spark, table)
    assert(rowset(pinned) === all)
    graft.sources.PpIndex.compact(spark, table)
    // A's already-resolved scan survives the swap; a fresh resolve
    // reads the compacted generation — same rows either way
    assert(rowset(pinned) === all, "pre-compact reader must survive the swap")
    assert(rowset(graft.sources.PpIndex.read(spark, table)) === all)
  }
}
