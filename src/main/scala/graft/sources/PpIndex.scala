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
  /** Bucket count for a NEW layout (build, or a resizing compact):
    * the session's shuffle-partition dial (r20, optimization guide §2
    * — partitioning derives from the parameterized dial, not a frozen
    * constant: `bucketBy(8)` capped the zero-exchange candidate
    * self-join at 8 tasks REGARDLESS of cluster width; production sets
    * `spark.sql.shuffle.partitions` to cluster width and gets a
    * matching bucket count, the bench runner sets it to
    * `$SPARK_GRAFT_CPUS`). Appends and layout-preserving compacts
    * never choose — they read the LIVE table's recorded spec
    * ([[liveBuckets]]), so a mixed layout is unconstructible.
    */
  private def sessionBuckets(spark: SparkSession): Int =
    spark.sessionState.conf.numShufflePartitions

  /** Rows per bucket below which extra buckets are pure overhead: the
    * bucket count doubles as the candidate self-join's parallelism, so
    * at scale it should track cluster width (the session dial) — but an
    * untuned session (Spark's default 200 partitions) building a small
    * corpus would otherwise produce hundreds of near-empty bucket files
    * and a 200-task merge join over them (r20 ADVICE). A base row is
    * ~24 bytes; 256k rows ≈ a few MB parquet, the floor where a bucket
    * stops being worth its per-file + per-task cost.
    */
  private val RowsPerBucket = 64L << 10

  /** Scale-adaptive bucket count for a NEW layout when the builder
    * knows the base row count: cluster width (the parameterized dial)
    * clamped so no bucket falls below [[RowsPerBucket]] — at 100 TB the
    * row term is astronomically larger than any dial and the width
    * wins; at fixture scale the clamp keeps the layout a handful of
    * well-formed files instead of `shuffle.partitions` splinters.
    */
  def adaptiveBuckets(spark: SparkSession, rows: Long): Int =
    math.max(1L, math.min(sessionBuckets(spark).toLong,
      (rows + RowsPerBucket - 1) / RowsPerBucket)).toInt

  /** The live generation's recorded bucket count, if any. */
  private def liveBuckets(spark: SparkSession, name: String): Option[Int] =
    if (spark.catalog.tableExists(name))
      spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
        .bucketSpec.map(_.numBuckets)
    else None

  def write(base: DataFrame, table: String, buckets: Int = 0): Unit = {
    val spark = base.sparkSession
    val n = if (buckets > 0) buckets else sessionBuckets(spark)
    val prev = currentTable(spark, table)
    val k = nextGen(spark, table)
    val gt = s"${table}_g$k"
    resetTable(spark, gt) // stray from a crashed build
    Bucketing.writeBucketed(base.select("doc_id", "s", "rk", "n"),
      gt, "s", n)
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

  /** Staleness probe for a maintained PPJoin index (r20, verdict ask
    * #3 — the one-row health reading every other persisted family
    * carries, [[BmIndex.driftProbe]]'s shape for the catalog tier):
    * one row a maintenance job can threshold for WHEN "rebuild when
    * filter power drifts past budget" fires ([[graft.queries.Dedup
    * .appendToPpIndex]] documents the decay; the d02c/d02d gates name
    * this probe as their rebuild trigger). Columns:
    *
    *  - `n_rows_frozen` / `n_rows_now` / `appended_frac` — appended
    *    shingle MASS vs the build: the build-time base size is
    *    recoverable from the frozen `_df` sibling alone
    *    (Σ df over df ≤ `maxDf` — exactly the rows the capped build
    *    wrote), so the volume reading needs no build-time snapshot.
    *  - `new_fp_frac` — the fraction of current base rows whose
    *    fingerprint the BUILD NEVER SAW (ranked at the df=0 rarest
    *    slot, always in prefixes): appended-vocabulary drift, the
    *    sliver where the frozen order is blindest.
    *  - `dropped_mass_frac_frozen` — the df-cap's BUILD-time coverage:
    *    Σ df over df > `maxDf` / Σ df, from the frozen sibling. Cap
    *    behavior is corpus-shaped (measured 1.0% of shingle mass
    *    dropped on the synthetic-dup corpus vs 30.9% on 600-token
    *    Zipf text — BENCHNOTES r19 longsalt), so the probe reports it
    *    rather than assuming it.
    *  - `crossed_mass_frac` / `max_df_now` — the MASS of current base
    *    rows in posting lists whose CURRENT df exceeds the cap: these
    *    lists grew past the cap through appends, so they are both the
    *    candidate-cost hot spot (filter-power decay) and exactly the
    *    rows where append != rebuild (the divergence budget —
    *    [[graft.queries.Dedup.ppIndexDrift]] counts the same crossing
    *    per-FINGERPRINT; this is the row-mass view).
    *
    * Reads only the base's `s` column (one aggregation) and the
    * two-column `_df` sibling — never shingles, never the corpus.
    */
  def driftProbe(spark: SparkSession, table: String, maxDf: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val frozen = readDf(spark, table)
    val frozenAgg = frozen.agg(
      sum(when(col("df") <= maxDf, col("df")).otherwise(0L)).as("n_rows_frozen"),
      sum(col("df")).as("mass_frozen"),
      sum(when(col("df") > maxDf, col("df")).otherwise(0L)).as("dropped_frozen"))
    val nowPer = read(spark, table).groupBy("s")
      .agg(count(lit(1)).as("df_now"))
      .join(frozen.select(col("s"), lit(1).as("seen")), Seq("s"), "left")
    val nowAgg = nowPer.agg(
      sum(col("df_now")).as("n_rows_now"),
      sum(when(col("seen").isNull, col("df_now")).otherwise(0L)).as("new_fp_rows"),
      sum(when(col("df_now") > maxDf, col("df_now")).otherwise(0L)).as("crossed_rows"),
      max(col("df_now")).as("max_df_now"))
    // empty guards (the ppIndexDrift r17 lesson): sums over an empty
    // relation are NULL, and a maintenance job thresholding a NULL
    // fraction would silently never fire
    frozenAgg.crossJoin(nowAgg).select(
      coalesce(col("n_rows_frozen"), lit(0L)).as("n_rows_frozen"),
      coalesce(col("n_rows_now"), lit(0L)).as("n_rows_now"),
      when(coalesce(col("n_rows_now"), lit(0L)) > 0,
        (col("n_rows_now") - coalesce(col("n_rows_frozen"), lit(0L)))
          .cast("double") / col("n_rows_now"))
        .otherwise(lit(0.0)).as("appended_frac"),
      when(coalesce(col("n_rows_now"), lit(0L)) > 0,
        coalesce(col("new_fp_rows"), lit(0L)).cast("double") / col("n_rows_now"))
        .otherwise(lit(0.0)).as("new_fp_frac"),
      when(coalesce(col("mass_frozen"), lit(0L)) > 0,
        coalesce(col("dropped_frozen"), lit(0L)).cast("double") / col("mass_frozen"))
        .otherwise(lit(0.0)).as("dropped_mass_frac_frozen"),
      when(coalesce(col("n_rows_now"), lit(0L)) > 0,
        coalesce(col("crossed_rows"), lit(0L)).cast("double") / col("n_rows_now"))
        .otherwise(lit(0.0)).as("crossed_mass_frac"),
      coalesce(col("max_df_now"), lit(0L)).as("max_df_now"))
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
      buckets: Int = 0): Unit = {
    val live = currentTable(spark, table).getOrElse(table)
    // the LIVE layout's count wins (r20): an append must match the
    // build's spec whatever dial the build ran under — the parameter
    // survives only as a test hook / legacy fallback
    val n = liveBuckets(spark, live)
      .getOrElse(if (buckets > 0) buckets else sessionBuckets(spark))
    // repartition on the bucket key (r20, the writeBucketed argument):
    // one file per TOUCHED bucket per append, instead of one per
    // (input partition × touched bucket)
    rows.select("doc_id", "s", "rk", "n")
      .repartition(n, org.apache.spark.sql.functions.col("s"))
      .write.mode("append")
      .format("parquet").bucketBy(n, "s").sortBy("s")
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
  def compact(spark: SparkSession, table: String, buckets: Int = 0): Unit = {
    val prev = currentTable(spark, table)
    val srcName = prev.getOrElse { recoverSwap(spark, table); table }
    // layout-preserving by default ("restores the build-time plan");
    // pass an explicit count to RESIZE — compact is the one safe
    // resizing point (a new generation, readers keep the old layout)
    val n = if (buckets > 0) buckets
      else liveBuckets(spark, srcName).getOrElse(
        // no recorded spec (legacy flat table): derive from the data —
        // a parquet count is metadata-cheap — instead of trusting an
        // untuned session dial (r20 ADVICE)
        adaptiveBuckets(spark, spark.table(srcName).count()))
    val k = nextGen(spark, table)
    val gt = s"${table}_g$k"
    resetTable(spark, gt) // stray from a crashed compact
    Bucketing.writeBucketed(
      spark.table(srcName).select("doc_id", "s", "rk", "n"),
      gt, "s", n)
    publish(spark, table, gt)
    pruneGens(spark, table, Set(k) ++ prev.flatMap(genNum(table, _)))
    // a legacy flat table that is no longer the source is 2+ cycles
    // old — drop it (prev nonEmpty means the source was a generation)
    if (prev.nonEmpty && spark.catalog.tableExists(table)) resetTable(spark, table)
  }
}
