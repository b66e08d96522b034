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
  * proportional to candidates, not the corpus.) Rebuild on corpus
  * change is one write of the base relation d02 computes anyway.
  */
object PpIndex {

  /** Persist a PPJoin base relation bucketed + sorted on the
    * fingerprint join key.
    */
  def write(base: DataFrame, table: String, buckets: Int = 8): Unit =
    Bucketing.writeBucketed(base.select("doc_id", "s", "rk", "n"),
      table, "s", buckets)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
