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
  * idempotent across replays the cheap way — the policy state is
  * re-derived FROM THE STORE at the first batch after any (re)start
  * (the store is the truth; a restart reads exactly what the crashed
  * run committed), so a crash AFTER the rebuild restarts below
  * threshold and the replayed batch (whose rows anti-join away) does
  * not re-fire it; a crash BEFORE restarts above threshold and the
  * replay fires it as the original run would have. Either way the
  * post-recovery artifact serves the same rows (the rebuild reassigns
  * whatever the store holds, and appended placement is
  * codebook-deterministic).
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
    // Maintenance state held driver-side across micro-batches (r20,
    // optimization guide §1/§2 — the per-batch loop ran ~7 driver
    // actions where 2 suffice): the policy needs only appended_frac,
    // and the append already counts the genuinely-new rows, so track
    // (frozen, appended) arithmetically — (n_now−n_frozen)/n_now ==
    // appended/(frozen+appended) exactly — instead of re-scanning the
    // whole index with the drift probe every batch. State is derived
    // from the STORE at the first batch after any (re)start, so the
    // at-least-once story is unchanged: the store is the truth, a
    // crashed run's committed appends are picked up by the re-read,
    // and replayed rows anti-join away (appended += 0). The frozen
    // codebook is collected once and reused until a rebuild replaces
    // it — appended placement under an unchanged book is bit-identical
    // to the per-batch re-collect it replaces.
    var frozen = -1L
    var appended = 0L
    var book: Seq[(Long, Seq[Double], Double)] = null
    val w = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        if (frozen < 0) {
          val d = IvfIndex.driftProbe(s, indexPath)
            .select("n_frozen", "n_now").head()
          frozen = d.getLong(0)
          appended = d.getLong(1) - d.getLong(0)
          book = Similarity.collectBook(IvfIndex.codebook(s, indexPath))
          // fail FAST on an empty bootstrap (r20 ADVICE): frozen = 0
          // with an empty store makes appended/(frozen+appended) NaN
          // and the rebuild threshold silently never fires.
          require(frozen > 0,
            s"IvfIngest.startMaintained($indexPath): frozen store is " +
              "empty — bootstrap the index with at least one vector " +
              "before maintaining it (the drift fraction needs a " +
              "non-empty baseline)")
        }
        val fresh = batch
          .join(IvfIndex.read(s, indexPath).select("vec_id"),
            Seq("vec_id"), "left_anti")
          .localCheckpoint(eager = false)
        val n = fresh.count()
        if (n > 0) {
          Similarity.appendToIvfIndexPreChecked(s, fresh, indexPath, book)
          appended += n
        }
        if (appended.toDouble / (frozen + appended) > threshold) {
          Similarity.rebuildIvfIndex(s, indexPath, retrain(s), retain)
          // the rebuild reassigned everything and froze NEW stats
          // (n_frozen = all stored rows) under the retrained codebook
          frozen += appended
          appended = 0L
          book = Similarity.collectBook(IvfIndex.codebook(s, indexPath))
          onRebuild()
        }
      }
    checkpointDir.foreach(d => w.option("checkpointLocation", d))
    w.start()
  }
}
