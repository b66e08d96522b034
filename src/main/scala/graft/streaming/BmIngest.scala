package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.TextAnalysis
import graft.sources.BmIndex

/** Streaming maintenance for the BM25 inverted index (r15) — the
  * [[VecIngest]] pattern applied to the search family: document rows
  * (doc_id, text) arrive as a stream and each micro-batch tokenizes +
  * appends ONLY the genuinely-new docs through
  * [[TextAnalysis.appendToBm25Index]]. Ranking statistics stay FROZEN
  * at the bootstrap build (the BmIndex stale-index serving contract:
  * already-indexed docs' scores never move; refresh = offline
  * rebuild).
  *
  * Crash safety is the same anti-join absorption as VecIngest, keyed
  * on the doclens relation: replayed batches drop their already-
  * indexed ids and top up only what never committed, so at-least-once
  * batches produce exactly-once index content (BmIngestSpec).
  */
object BmIngest {

  /** One micro-batch: drop already-indexed ids (replay absorption),
    * append the rest. Batch rows carry (doc_id, text).
    */
  def processBatch(batch: DataFrame, indexPath: String): Unit = {
    val s = batch.sparkSession
    val fresh = batch
      .join(BmIndex.doclens(s, indexPath).select("doc_id"),
        Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = false)
    if (!fresh.isEmpty) TextAnalysis.appendToBm25Index(s, indexPath, fresh)
  }

  /** Start the ingest over a (doc_id, text) stream. The index at
    * `indexPath` must already exist ([[TextAnalysis.buildBm25Index]]
    * — the bootstrap freezes df/avgdl there).
    */
  def start(stream: DataFrame, indexPath: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, indexPath) }
    checkpointDir.foreach(d => w.option("checkpointLocation", d))
    w.start()
  }

  /** Start the MAINTAINED ingest (r20, verdict ask #1 — the
    * [[IvfIngest.startMaintained]] pattern applied to the search
    * family): append per micro-batch under the frozen statistics, run
    * [[graft.sources.BmIndex.driftProbe]], and when `appended_frac`
    * exceeds `threshold` OR `avgdl_drift` exceeds `avgdlThreshold`,
    * REBUILD the index with REFRESHED `_df`/`_stats` through
    * [[TextAnalysis.rebuildBm25Index]] — inside `foreachBatch`, so
    * append and rebuild are serialized by construction (SCALE.md's
    * writer-serialization regime 1). The two dials cover the two ways
    * frozen stats go stale: volume (idf's N lags reality) and shape
    * (appended docs' lengths move the true avgdl off the frozen
    * normalizer even at modest volume). The index at `indexPath` must
    * already exist (bootstrap with [[TextAnalysis.buildBm25Index]]).
    *
    * Readers need nothing: a serving plan pinned before (or during)
    * the rebuild keeps its resolved generation for a full retention
    * cycle; `retain` ≥ 2 lets long-lived readers span consecutive
    * in-stream rebuilds (the IvfIngest r20 dial). `onRebuild` is the
    * driver-side policy-firing hook the t22 gate counts through.
    *
    * Crash safety (at-least-once `foreachBatch`): the append half is
    * the standing replay-absorbing anti-join. The rebuild half is
    * idempotent either side of a crash — after the rebuild the
    * refreshed `_stats` put the probe below threshold, so the replayed
    * batch (whose rows anti-join away) does not re-fire it; before,
    * the replay fires it as the original run would have, and the
    * rebuild re-derives the same artifact from whatever the store
    * holds (the per-(term, doc) max collapses the crash window's
    * duplicate posting rows).
    */
  def startMaintained(stream: DataFrame, indexPath: String,
      threshold: Double,
      avgdlThreshold: Double = Double.MaxValue,
      onRebuild: () => Unit = () => (),
      checkpointDir: Option[String] = None,
      retain: Int = 1): StreamingQuery = {
    // Policy state held driver-side across micro-batches (r20,
    // optimization — the IvfIngest treatment): the probe's inputs are
    // exact longs the append itself already counts, so track (n,
    // sum_dl) for the frozen baseline and the live store and evaluate
    // the probe's own double expressions on them — bit-identical
    // decisions without re-scanning the whole doclens relation every
    // batch. State is derived FROM THE STORE at the first batch after
    // any (re)start (the store is the truth), so the at-least-once
    // story is unchanged: replayed rows anti-join away (append counts
    // 0) and a crashed run's committed appends are picked up by the
    // re-read. driftProbe remains the read-side health probe.
    var nFrozen = -1L; var sumDlFrozen = 0L
    var nNow = 0L; var sumDlNow = 0L
    val w = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        if (nFrozen < 0) {
          val st = BmIndex.stats(s, indexPath)
            .select("n_docs", "sum_dl").head()
          nFrozen = st.getLong(0); sumDlFrozen = st.getLong(1)
          val cur = BmIndex.doclens(s, indexPath)
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)),
              org.apache.spark.sql.functions.sum("dl")).head()
          nNow = cur.getLong(0); sumDlNow = cur.getLong(1)
          // fail FAST on an empty bootstrap (r20 ADVICE): nFrozen = 0
          // makes the drift ratio NaN and every threshold comparison
          // silently false — the rebuild would never fire. An index
          // this loop can maintain must have a non-empty baseline.
          require(nFrozen > 0,
            s"BmIngest.startMaintained($indexPath): frozen stats record " +
              s"n_docs=$nFrozen — bootstrap the index with at least one " +
              "document before maintaining it (drift arithmetic needs a " +
              "non-empty baseline)")
        }
        val (n, sdl) = TextAnalysis.appendFreshToBm25Index(s, indexPath, batch)
        nNow += n; sumDlNow += sdl
        // the probe's expressions verbatim: (n_now−n_frozen)/n_now and
        // |avgdl_now/avgdl_frozen − 1| in the same IEEE double ops
        val frac = (nNow - nFrozen).toDouble / nNow
        val drift = math.abs((sumDlNow.toDouble / nNow) /
          (sumDlFrozen.toDouble / nFrozen) - 1.0)
        if (frac > threshold || drift > avgdlThreshold) {
          TextAnalysis.rebuildBm25Index(s, indexPath, retain)
          // the rebuild refreshed _stats: the frozen baseline is now
          // exactly the live store
          nFrozen = nNow; sumDlFrozen = sumDlNow
          onRebuild()
        }
      }
    checkpointDir.foreach(d => w.option("checkpointLocation", d))
    w.start()
  }
}
