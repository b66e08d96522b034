package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.Similarity
import graft.sources.PqIndex

/** Streaming maintenance for the IVFADC index (r15) — the DocPipeline
  * pattern applied to the ANN family: embedding rows arrive as a
  * stream, and each micro-batch encodes + appends the genuinely-new
  * vectors through [[Similarity.appendToIvfAdcIndex]] against the
  * PERSISTED codebook + coarse book. Placement is artifact-relative
  * (appended vectors land exactly where a same-codebook rebuild puts
  * them — IvfAdcAppendSpec), so the stream keeps the serving paths'
  * contract without ever retraining; retraining is a rebuild, offline.
  *
  * Crash safety (at-least-once `foreachBatch`): replayed batches are
  * absorbed by the anti-join against the index itself — already-
  * indexed ids drop out, only the missing remainder appends, so a
  * crash ANYWHERE (before, mid-, or after the append) replays to the
  * same final index (task-committed parquet files are the unit of
  * partial progress; a replay tops up exactly the ids whose files
  * never committed). The loud disjointness guard inside
  * appendToIvfAdcIndex stays meaningful for direct API users — this
  * wrapper is what makes replays hit it with an already-filtered
  * batch. VecIngestSpec pins replay idempotence and the
  * kill/resume-equals-rebuild equality.
  */
object VecIngest {

  /** One micro-batch: drop already-indexed ids (replay absorption),
    * append the rest. Batch rows carry the embeddings shape
    * (vec_id, label, embedding).
    */
  def processBatch(batch: DataFrame, indexPath: String): Unit = {
    val s = batch.sparkSession
    val fresh = batch
      .join(PqIndex.read(s, indexPath).select("vec_id"),
        Seq("vec_id"), "left_anti")
      .localCheckpoint(eager = false)
    if (!fresh.isEmpty) Similarity.appendToIvfAdcIndex(s, fresh, indexPath)
  }

  /** Start the ingest over an embeddings stream. The index at
    * `indexPath` must already exist (bootstrap with
    * [[Similarity.buildIvfAdcIndex]] — the codebook is frozen there).
    * Pass `checkpointDir` to make the query restartable; a killed
    * stream resumed from the same checkpoint re-reads exactly the
    * unprocessed offsets plus at most one replayed batch, which the
    * anti-join absorbs.
    *
    * r20 (optimization): the append's frozen inputs — PQ codebook and
    * coarse routing book — are collected ONCE at the first batch and
    * reused for the life of the stream (they cannot change under a
    * running ingest: writers are serialized and this stream is the
    * writer), and the anti-join doubles as the disjointness proof, so
    * the per-batch loop runs two actions (count, append-write) instead
    * of five. Placement is bit-identical (same rows, same books, same
    * kernels — VecIngestSpec pins stream == batch content).
    */
  def start(stream: DataFrame, indexPath: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    var st: Similarity.AdcAppendState = null
    val w = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        if (st == null) st = Similarity.adcAppendState(s, indexPath)
        val fresh = batch
          .join(PqIndex.read(s, indexPath).select("vec_id"),
            Seq("vec_id"), "left_anti")
          .localCheckpoint(eager = false)
        if (fresh.count() > 0)
          Similarity.appendToIvfAdcPreChecked(s, fresh, indexPath, st)
      }
    checkpointDir.foreach(d => w.option("checkpointLocation", d))
    w.start()
  }
}
