package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted, BUCKETED layout for the PPJoin base relation
  * (`doc_id, s, rk, n` — the df-capped shingle-fingerprint index with
  * per-doc global-order ranks that [[graft.queries.Dedup]]'s d02
  * builds) — the production analogue of the session-shared
  * `ppjoin_base` silver tier, completing the [[BandIndex]] treatment
  * for the similarity-join family.
  *
  * The expensive half of a repeated Jaccard self-join is the CANDIDATE
  * join: prefix rows equi-joined on the fingerprint `s`. Bucketing the
  * base on `s` makes that self-join a zero-exchange SortMergeJoin —
  * both sides read pre-partitioned and pre-sorted (PpIndexSpec pins no
  * Exchange in the candidate subtree) — so a re-run against a 100 TB
  * corpus pays scan + merge, never the index reshuffle. (The verify
  * join's left-semi restriction re-keys on doc_id and reshuffles
  * regardless of storage — inherent to the counting formulation, and
  * proportional to candidates, not the corpus.)
  *
  * r15: the index is MAINTAINABLE, not rebuild-only — [[append]] adds
  * new docs' rows into the bucketed layout, and the [[writeDf]]
  * sibling freezes the build-time document frequencies so appended
  * docs rank under the build's prefix order (the correctness of that
  * contract lives in [[graft.queries.Dedup.appendToPpIndex]]).
  */
object PpIndex {

  /** Persist a PPJoin base relation bucketed + sorted on the
    * fingerprint join key. Resets the target first (drop + warehouse-
    * dir delete — the BmIndex.write convention): an in-query build
    * must survive a fresh JVM whose in-memory catalog has no entry for
    * a leftover warehouse directory (saveAsTable would otherwise fail
    * LOCATION_ALREADY_EXISTS).
    */
  def write(base: DataFrame, table: String, buckets: Int = 8): Unit = {
    val spark = base.sparkSession
    resetTable(spark, table)
    Bucketing.writeBucketed(base.select("doc_id", "s", "rk", "n"),
      table, "s", buckets)
  }

  /** Drop `table` AND delete its leftover warehouse directory — an
    * in-query build must survive a fresh JVM whose in-memory catalog
    * has no entry for the directory (saveAsTable would otherwise fail
    * LOCATION_ALREADY_EXISTS).
    */
  private def resetTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
  }

  /** Finish an interrupted [[compact]] swap, if one is detected: the
    * live table absent with the compacted `_c` sibling present (the
    * only crash window — see compact) → rename the sibling in.
    * Idempotent, one catalog lookup when healthy.
    */
  private def recoverSwap(spark: SparkSession, table: String): Unit =
    if (!spark.catalog.tableExists(table) &&
        spark.catalog.tableExists(table + "_c")) {
      // [[compact]]'s resetTable(live) is a DROP then a directory
      // delete — a crash BETWEEN them leaves the live warehouse dir on
      // disk with no catalog entry, and the managed-table rename below
      // must move `_c`'s directory onto that leftover (which nests or
      // fails depending on FS semantics — r17, ADVICE). Clear it first:
      // the catalog says the live table does not exist, so the
      // directory is provably orphaned.
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table)
      wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
      spark.sql(s"ALTER TABLE ${table}_c RENAME TO $table")
    }

  def read(spark: SparkSession, table: String): DataFrame = {
    recoverSwap(spark, table)
    spark.table(table)
  }

  /** Persist the BUILD-time per-fingerprint document frequency —
    * every fp seen at build, capped and uncapped alike (the base alone
    * can't recover the dropped fps, and appends must keep dropping
    * them). Frozen: appends never rewrite it.
    */
  def writeDf(dfAll: DataFrame, table: String): Unit = {
    // same fresh-JVM reset as [[write]] (r16): a leftover warehouse dir
    // with no entry in this session's in-memory catalog fails even an
    // overwrite saveAsTable with LOCATION_ALREADY_EXISTS
    resetTable(dfAll.sparkSession, table + "_df")
    dfAll.select("s", "df").write.mode("overwrite")
      .format("parquet").saveAsTable(table + "_df")
  }

  def readDf(spark: SparkSession, table: String): DataFrame =
    spark.table(table + "_df")

  /** Append pre-ranked base rows into the bucketed layout with the
    * SAME bucket spec as [[write]] — each append adds one file per
    * touched bucket. Bucket pruning and the exchange-free candidate
    * self-join survive appends (bucket membership is a function of
    * `s` alone); per-bucket SORTEDNESS does not (Spark only claims
    * sort order for single-file buckets), so post-append plans carry
    * in-partition Sorts — still zero shuffle (PpAppendSpec).
    */
  def append(rows: DataFrame, spark: SparkSession, table: String,
      buckets: Int = 8): Unit =
    rows.select("doc_id", "s", "rk", "n").write.mode("append")
      .format("parquet").bucketBy(buckets, "s").sortBy("s")
      .saveAsTable(table)

  /** Rewrite the table back to one sorted file per bucket — the
    * maintenance companion to [[append]] (the DocPipeline.compact
    * story for the bucketed tier): every append adds a file per
    * touched bucket, which keeps the join exchange-free but forfeits
    * the scan's claimed sort order (Spark only claims it for
    * single-file buckets), so post-append plans re-sort in-partition.
    * Compacting restores the build-time plan. Rows are untouched —
    * same data, same bucket spec (PpAppendSpec pins row identity and
    * the Sort nodes' disappearance).
    *
    * r16 (ADVICE): swap-based, not overwrite-in-place. The old form
    * eagerly localCheckpoint'ed the table and overwrote its own source
    * — holding the ONLY copy of the index in unreplicated executor
    * state while the source was deleted; an executor loss in that
    * window lost the index irrecoverably. Now the compacted rows land
    * in a sibling `_c` TABLE read straight from the durable source,
    * and the swap is two catalog ops (drop live, rename sibling in —
    * a managed-table rename moves the warehouse directory with it).
    * Crash before the drop leaves the live table untouched (the stray
    * `_c` is reset on the next compact); crash between drop and rename
    * is healed by [[recoverSwap]] at the head of every read. Run
    * between appends, not concurrently with a reader.
    */
  def compact(spark: SparkSession, table: String, buckets: Int = 8): Unit = {
    recoverSwap(spark, table)
    resetTable(spark, table + "_c")
    Bucketing.writeBucketed(
      spark.table(table).select("doc_id", "s", "rk", "n"),
      table + "_c", "s", buckets)
    resetTable(spark, table)
    spark.sql(s"ALTER TABLE ${table}_c RENAME TO $table")
  }
}
