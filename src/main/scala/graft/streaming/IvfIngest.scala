package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.Similarity
import graft.sources.IvfIndex

/** Streaming maintenance for the float IVF index (r19, verdict stretch
  * #8 — the LOOP composed under live ingest): embedding rows arrive as
  * a stream; each micro-batch appends the genuinely-new vectors under
  * the frozen codebook ([[Similarity.appendToIvfIndex]], the VecIngest
  * pattern at the v02 tier), then runs the drift probe and — when the
  * appended fraction crosses the policy threshold — REBUILDS the index
  * in place ([[Similarity.rebuildIvfIndex]]: retrain + writeGen
  * publish) while the stream keeps running.
  *
  * Writer serialization is BY CONSTRUCTION (SCALE.md regime 1): the
  * rebuild runs inside `foreachBatch`, and micro-batches are serial,
  * so append and rebuild can never race — the one concurrency contract
  * the generation layout demands of writers. Readers need nothing:
  * a serving plan pinned before (or during) the rebuild keeps its
  * resolved generation for a full retention cycle.
  *
  * Crash safety (at-least-once `foreachBatch`): the append half is
  * VecIngest's replay-absorbing anti-join. The rebuild half is
  * idempotent across replays the cheap way — a crash AFTER the rebuild
  * leaves the probe below threshold, so the replayed batch (whose rows
  * anti-join away) does not re-fire it; a crash BEFORE leaves the
  * probe above threshold and the replay fires it as the original run
  * would have. Either way the post-recovery artifact serves the same
  * rows (the rebuild reassigns whatever the store holds, and appended
  * placement is codebook-deterministic).
  */
object IvfIngest {

  /** One micro-batch: drop already-indexed ids (replay absorption),
    * append the rest under the frozen book. Batch rows carry the
    * embeddings shape (vec_id, label, embedding).
    */
  def processBatch(batch: DataFrame, indexPath: String): Unit = {
    val s = batch.sparkSession
    val fresh = batch
      .join(IvfIndex.read(s, indexPath).select("vec_id"),
        Seq("vec_id"), "left_anti")
      .localCheckpoint(eager = false)
    if (!fresh.isEmpty) Similarity.appendToIvfIndex(s, fresh, indexPath)
  }

  /** Start the MAINTAINED ingest: append per micro-batch, probe, and
    * rebuild through `retrain` whenever `appended_frac` exceeds
    * `threshold`. The index at `indexPath` must already exist
    * (bootstrap with [[graft.sources.IvfIndex.writeWithCodebook]]).
    * `retrain` supplies the new codebook — deterministic trainers
    * (e.g. the decimal-sum Lloyd) keep the final artifact independent
    * of where the micro-batch boundaries fell, since appended
    * placement under a loaded book is bit-reproducible. `onRebuild`
    * is a driver-side hook (the v15 gate counts policy firings
    * through it). `retain` plumbs the snapshot-expiry dial through to
    * every rebuild's writeGen (r20, ADVICE): with the default 1 a
    * reader pinned before rebuild N fails loudly as soon as rebuild
    * N+1 fires under live ingest — retain ≥ 2 is what lets long-lived
    * readers span consecutive in-stream rebuilds.
    */
  def startMaintained(stream: DataFrame, indexPath: String,
      threshold: Double,
      retrain: org.apache.spark.sql.SparkSession => DataFrame,
      onRebuild: () => Unit = () => (),
      checkpointDir: Option[String] = None,
      retain: Int = 1): StreamingQuery = {
    val w = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, indexPath)
        val s = batch.sparkSession
        val frac = IvfIndex.driftProbe(s, indexPath)
          .select("appended_frac").head().getDouble(0)
        if (frac > threshold) {
          Similarity.rebuildIvfIndex(s, indexPath, retrain(s), retain)
          onRebuild()
        }
      }
    checkpointDir.foreach(d => w.option("checkpointLocation", d))
    w.start()
  }
}
