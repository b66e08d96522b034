package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.Text
import graft.queries.Dedup
import graft.sources.PpIndex

/** Streaming maintenance for the persisted PPJoin index (r17, verdict
  * ask #6) — completing the streaming-assembly matrix: [[BmIngest]]
  * maintains the search index, [[VecIngest]] the vector index, this
  * the similarity-join index. Document rows (doc_id, text) arrive as
  * a stream; each micro-batch shingles its docs, ranks their
  * fingerprints under the BUILD-FROZEN total order
  * ([[Dedup.rankUnderFrozenOrder]] — the same code the batch append
  * runs), and appends into the bucketed layout. The frozen `_df`
  * sibling is never touched (the [[PpIndex]] staleness contract:
  * appends keep the build's kept-fp universe and prefix order, so the
  * candidate join stays exact below the df cap).
  *
  * Replay absorption is at FINGERPRINT-ROW granularity — an anti-join
  * of the ranked batch rows against the index's existing (doc_id, s)
  * pairs — NOT at doc granularity like [[BmIngest]]'s doclens key.
  * The difference is forced by the layout: one append job scatters a
  * doc's fingerprints across bucket files, and a crash inside the
  * job-commit window can leave HALF a doc's rows visible. Doc-level
  * absorption would then mark the doc "already indexed" and orphan
  * its missing fingerprints forever (verdicts change: the doc's
  * Jaccard shrinks); BmIngest's answer (re-append everything, let
  * consumers collapse exact duplicates with max()) doesn't transfer
  * because the PPJoin verify COUNTS shared fingerprint rows —
  * duplicates would inflate intersections. Row-level absorption is
  * exact instead: ranking under the frozen order is deterministic
  * given the doc (same rows every replay, same rk/n — the partially
  * committed half and the topped-up half reassemble the full append
  * bit for bit). PpIngestSpec pins both the half-committed replay and
  * the full-batch replay.
  *
  * Scale: the anti-join touches two narrow columns of the base and is
  * maintenance-path work (a micro-batch append), never query-path;
  * the batch side is batch-sized. Appends keep bucket membership (a
  * function of s alone), so the serving plan stays exchange-free
  * post-ingest exactly as after batch appends (PpAppendSpec).
  */
object PpIngest {

  /** One micro-batch: shingle (doc_id, text) rows, rank under the
    * frozen order, top up only the rows the index doesn't already
    * hold.
    */
  def processBatch(batch: DataFrame, table: String): Unit = {
    val s = batch.sparkSession
    val shingled = batch.select(col("doc_id"),
      Text.distinctShingles(col("text")).as("sh"))
    val ranked = Dedup.rankUnderFrozenOrder(s, table, shingled)
    val fresh = ranked
      .join(PpIndex.read(s, table).select("doc_id", "s"),
        Seq("doc_id", "s"), "left_anti")
      .localCheckpoint(eager = false)
    if (!fresh.isEmpty) PpIndex.append(fresh, s, table)
  }

  /** Start the ingest over a (doc_id, text) stream. The index table
    * must already exist ([[Dedup.buildPpIndex]] — the bootstrap
    * freezes the df order there).
    */
  def start(stream: DataFrame, table: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, table) }
    checkpointDir.foreach(d => w.option("checkpointLocation", d))
    w.start()
  }
}
