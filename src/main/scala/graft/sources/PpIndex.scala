package graft.sources

import org.apache.hadoop.fs.Path
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
  *
  * r17: reader-safe maintenance — the [[AtomicSwap]] generation-
  * manifest pattern applied to a CATALOG artifact. The live data is a
  * generation TABLE `<table>_gN`; a tiny rename-committed pointer
  * (`<warehouse>/<table>_ptr/mf-K`, content = the live table name) is
  * the commit. Compact builds `_g(N+1)` beside the live table,
  * publishes the pointer, and drops only generations OLDER than N —
  * so a reader that resolved the pre-compact table keeps complete,
  * untouched files for one full compaction cycle (the same
  * snapshot-expiry contract as the parquet index families), instead
  * of the old drop-and-rename swap moving its files mid-scan.
  * Pre-r17 flat tables (`<table>` with no pointer) read as before and
  * migrate on the first write/compact.
  */
object PpIndex {

  private def ptrRoot(spark: SparkSession, table: String): Path =
    new Path(spark.conf.get("spark.sql.warehouse.dir"), table + "_ptr")

  /** The live generation table's name, if the pointer layout is in
    * use (the newest committed pointer file's content).
    */
  private def currentTable(spark: SparkSession, table: String): Option[String] = {
    val root = ptrRoot(spark, table)
    AtomicSwap.currentGen(AtomicSwap.fsOf(spark, root.toString), root)
  }

  private def genNum(table: String, name: String): Option[Int] =
    if (name.startsWith(table + "_g"))
      name.stripPrefix(table + "_g").toIntOption
    else None

  /** Next free generation number: one past everything visible in the
    * warehouse directory (strays from crashed builds included — a
    * fresh JVM's in-memory catalog forgets tables, their dirs don't)
    * and the pointer.
    */
  private def nextGen(spark: SparkSession, table: String): Int = {
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirNums =
      if (fs.exists(wh)) fs.listStatus(wh).toSeq.filter(_.isDirectory)
        .flatMap(s => genNum(table, s.getPath.getName))
      else Seq.empty
    (dirNums ++ currentTable(spark, table).flatMap(genNum(table, _))
      :+ -1).max + 1
  }

  /** Publish `liveName` as the pointer's target — the commit point of
    * build/append/compact (tmp-write + rename, via the AtomicSwap
    * manifest mechanics).
    */
  private def publish(spark: SparkSession, table: String, liveName: String): Unit = {
    val root = ptrRoot(spark, table)
    val fs = AtomicSwap.fsOf(spark, root.toString)
    fs.mkdirs(root)
    AtomicSwap.publish(fs, root, liveName)
  }

  /** Drop every generation table of `table` whose number is not in
    * `keep` (catalog entry AND warehouse dir — strays may have either
    * without the other).
    */
  private def pruneGens(spark: SparkSession, table: String, keep: Set[Int]): Unit = {
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirNums =
      if (fs.exists(wh)) fs.listStatus(wh).toSeq.filter(_.isDirectory)
        .flatMap(s => genNum(table, s.getPath.getName))
      else Seq.empty
    dirNums.filterNot(keep).distinct
      .foreach(k => resetTable(spark, s"${table}_g$k"))
  }

  /** Persist a PPJoin base relation bucketed + sorted on the
    * fingerprint join key, as a NEW generation: the pointer publish is
    * the commit, the previous generation (if any) survives one cycle
    * for open readers, older ones are dropped. A leftover pre-r17
    * flat table gets the SAME one-cycle grace as a superseded
    * generation (r18, ADVICE — rebuild-over-legacy previously dropped
    * it in the same call, deleting a pinned reader's files mid-scan
    * where compact-over-legacy didn't): it survives this write and is
    * dropped by the NEXT write/compact, so migration has a uniform
    * reader contract.
    */
  def write(base: DataFrame, table: String, buckets: Int = 8): Unit = {
    val spark = base.sparkSession
    val prev = currentTable(spark, table)
    val k = nextGen(spark, table)
    val gt = s"${table}_g$k"
    resetTable(spark, gt) // stray from a crashed build
    Bucketing.writeBucketed(base.select("doc_id", "s", "rk", "n"),
      gt, "s", buckets)
    publish(spark, table, gt)
    pruneGens(spark, table, Set(k) ++ prev.flatMap(genNum(table, _)))
    // a legacy flat table is only dropped once it is 2+ cycles old
    // (prev nonEmpty means this write superseded a generation, not the
    // legacy table) — the compact() contract, applied uniformly
    if (prev.nonEmpty && spark.catalog.tableExists(table)) resetTable(spark, table)
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

  /** Finish an interrupted PRE-R17 [[compact]] swap, if one is
    * detected: the live table absent with the compacted `_c` sibling
    * present → rename the sibling in. Kept for legacy flat artifacts
    * only; pointer-layout generations never rename.
    */
  private def recoverSwap(spark: SparkSession, table: String): Unit =
    if (!spark.catalog.tableExists(table) &&
        spark.catalog.tableExists(table + "_c")) {
      // the old compact's resetTable(live) was a DROP then a directory
      // delete — a crash BETWEEN them left the live warehouse dir on
      // disk with no catalog entry; clear it before the rename (the
      // catalog says the live table does not exist, so the directory
      // is provably orphaned)
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table)
      wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
      spark.sql(s"ALTER TABLE ${table}_c RENAME TO $table")
    }

  def read(spark: SparkSession, table: String): DataFrame =
    currentTable(spark, table) match {
      case Some(live) => spark.table(live)
      case None => recoverSwap(spark, table); spark.table(table)
    }

  /** Persist the BUILD-time per-fingerprint document frequency —
    * every fp seen at build, capped and uncapped alike (the base alone
    * can't recover the dropped fps, and appends must keep dropping
    * them). Frozen across appends; REBUILDS replace it — so it rides
    * the same pointer-generation mechanics as the base (r17): a
    * rebuild-over-live must not drop the table under an open reader.
    */
  def writeDf(dfAll: DataFrame, table: String): Unit = {
    val spark = dfAll.sparkSession
    val logical = table + "_df"
    val prev = currentTable(spark, logical)
    val k = nextGen(spark, logical)
    val gt = s"${logical}_g$k"
    resetTable(spark, gt) // stray from a crashed build
    dfAll.select("s", "df").write.mode("overwrite")
      .format("parquet").saveAsTable(gt)
    publish(spark, logical, gt)
    pruneGens(spark, logical, Set(k) ++ prev.flatMap(genNum(logical, _)))
    // one-cycle grace for a legacy flat table, as in [[write]] (r18)
    if (prev.nonEmpty && spark.catalog.tableExists(logical)) resetTable(spark, logical)
  }

  def readDf(spark: SparkSession, table: String): DataFrame =
    currentTable(spark, table + "_df") match {
      case Some(live) => spark.table(live)
      case None => spark.table(table + "_df")
    }

  /** Append pre-ranked base rows into the live generation with the
    * SAME bucket spec as [[write]] — each append adds one file per
    * touched bucket, then bumps the pointer (the durable record that
    * the append committed). Bucket pruning and the exchange-free
    * candidate self-join survive appends (bucket membership is a
    * function of `s` alone); per-bucket SORTEDNESS does not (Spark
    * only claims sort order for single-file buckets), so post-append
    * plans carry in-partition Sorts — still zero shuffle
    * (PpAppendSpec).
    */
  def append(rows: DataFrame, spark: SparkSession, table: String,
      buckets: Int = 8): Unit = {
    val live = currentTable(spark, table).getOrElse(table)
    rows.select("doc_id", "s", "rk", "n").write.mode("append")
      .format("parquet").bucketBy(buckets, "s").sortBy("s")
      .saveAsTable(live)
    // the pointer bump commits against the generation the append wrote
    // into — a compact that raced this append would have snapshotted
    // the pre-append table and the NEXT compact drops it, losing the
    // appended rows silently; writers (append vs compact) must be
    // serialized, and a violation fails loudly here (r18, ADVICE —
    // the BmIndex/commitAppend contract applied to the catalog tier)
    currentTable(spark, table).foreach { cur =>
      require(cur == live,
        s"PpIndex.append($table): appended into $live but the live " +
          s"generation is now $cur — a compact/rebuild ran concurrently " +
          "(writers must be serialized; only readers are compact-safe). " +
          "Re-run the append against the current generation.")
      publish(spark, table, cur)
    }
  }

  /** Rewrite the index back to one sorted file per bucket — the
    * maintenance companion to [[append]]: every append adds a file per
    * touched bucket, which keeps the join exchange-free but forfeits
    * the scan's claimed sort order (Spark only claims it for
    * single-file buckets), so post-append plans re-sort in-partition.
    * Compacting restores the build-time plan. Rows are untouched —
    * same data, same bucket spec (PpAppendSpec pins row identity and
    * the Sort nodes' disappearance).
    *
    * r17: generation-based and READER-SAFE — the compacted rows land
    * in table `_g(N+1)` read straight from the live generation, the
    * pointer publish is the commit, and the superseded generation
    * survives until the compact after this one (see the class note).
    * A legacy flat artifact is migrated: it serves as the "previous
    * generation" for one cycle and is dropped by the next write or
    * compact.
    */
  def compact(spark: SparkSession, table: String, buckets: Int = 8): Unit = {
    val prev = currentTable(spark, table)
    val srcName = prev.getOrElse { recoverSwap(spark, table); table }
    val k = nextGen(spark, table)
    val gt = s"${table}_g$k"
    resetTable(spark, gt) // stray from a crashed compact
    Bucketing.writeBucketed(
      spark.table(srcName).select("doc_id", "s", "rk", "n"),
      gt, "s", buckets)
    publish(spark, table, gt)
    pruneGens(spark, table, Set(k) ++ prev.flatMap(genNum(table, _)))
    // a legacy flat table that is no longer the source is 2+ cycles
    // old — drop it (prev nonEmpty means the source was a generation)
    if (prev.nonEmpty && spark.catalog.tableExists(table)) resetTable(spark, table)
  }
}
