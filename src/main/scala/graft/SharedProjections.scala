package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Opt-in cross-query reuse of hot derived projections — specifically
  * the `documents` distinct-shingle relation, which six dedup queries
  * (d02–d07) each recompute from the raw scan when run standalone.
  *
  * Default OFF: a declared query must stand alone (the specs pin plans
  * of the uncached form, and the driver's correctness gate should
  * exercise the real per-query path). The Bench and Verify mains enable
  * it because THEY run the whole suite in one session, where the
  * recompute is pure fixed overhead: the first consuming query pays one
  * materialization, the other five read the in-memory columnar form.
  * Results are identical either way — the projection is deterministic —
  * and the cache is keyed by data directory, so scale factors don't
  * cross-contaminate.
  *
  * At 100 TB the equivalent is a persisted silver table (write the
  * shingle projection once, read it from every consumer), not an
  * executor-memory cache; MEMORY_AND_DISK here mirrors that shape at
  * bench scale.
  */
object SharedProjections {

  @volatile private var on = false
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  /** Enable reuse for this JVM (suite runners only). */
  def enable(): Unit = on = true

  /** Turn reuse back off — TEST hygiene only (a spec that enables the
    * JVM-wide flag must not change later suites' execution mode); the
    * runner mains never disable. Clears BOTH tiers (r15, ADVICE): a
    * cached DataFrame is bound to the SparkSession that built it and an
    * artifact may point at state a later suite wipes — handing either
    * out after a re-enable would fail (or serve stale state) far from
    * the cause. Unpersist is best-effort: the owning session may
    * already be stopped.
    */
  private[graft] def disable(): Unit = {
    on = false
    cache.values.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    cache.clear()
    artifacts.clear()
  }

  /** `build`, or its cached twin when reuse is enabled. */
  def reuse(kind: String, dir: String)(build: => DataFrame): DataFrame =
    if (!on) build
    else cache.getOrElseUpdate((kind, dir),
      build.persist(StorageLevel.MEMORY_AND_DISK))

  private val artifacts =
    scala.collection.concurrent.TrieMap.empty[(String, String), Any]

  /** Arbitrary once-per-(kind, dir) derived ARTIFACT — e.g. the state
    * directory a completed DocPipeline replay leaves behind, which
    * both p06 and p08 read (r14: two gated queries, one replay per
    * suite session instead of two). Same opt-in semantics as [[reuse]]:
    * standalone queries rebuild from scratch, suite runners share.
    */
  def reuseArtifact[T](kind: String, dir: String)(build: => T): T =
    if (!on) build
    else artifacts.getOrElseUpdate((kind, dir), build).asInstanceOf[T]
}
