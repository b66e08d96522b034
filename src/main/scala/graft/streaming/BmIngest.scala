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
}
