package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, BUCKETED layout for the MinHash band-key index
  * ([[graft.queries.Dedup.bandKeys]]) — the write-once/join-many scale
  * path for every consumer of the near-dup blocking key (d04/d06/d07
  * re-runs, the p01 pipeline, the incremental DocPipeline).
  *
  * The band join is a self-equi-join on the composite key (j, bkey).
  * Persisting the index bucketed on an injective scalar encoding of
  * that key means:
  *
  *  - index ⋈ index (full re-cluster, the d06/d07 edge relation):
  *    SortMergeJoin with ZERO shuffle exchanges — both sides read
  *    pre-partitioned and pre-sorted (BandIndexSpec pins no Exchange
  *    in the join subtree);
  *  - index ⋈ new-docs (the incremental DocPipeline shape): only the
  *    SMALL new side shuffles to the index's bucketing; the historical
  *    side — the one that grows with the corpus — never moves
  *    (BandIndexSpec pins exactly one Exchange, on the new side).
  *
  * At 100 TB the band index is the second-largest relation in the
  * dedup pipeline (4 rows per doc); re-shuffling it on every
  * re-cluster or micro-batch is the dominant recurring cost that this
  * layout converts into a one-time write.
  *
  * WRITE-ONCE BY CONTRACT (r18, verdict ask #7): this index has no
  * append path and writes directly as a flat bucketed table, OUTSIDE
  * the [[AtomicSwap]]/[[PpIndex]] generation layout — safe only
  * because nothing ever mutates it after build. Any future
  * append/compact path MUST first adopt the PpIndex pointer-generation
  * mechanics (see the fence note in AtomicSwap's header).
  */
object BandIndex {

  /** Injective scalar encoding of the composite band key: `j` and the
    * 4 signature values joined with separators that cannot occur in
    * decimal integers — equality on `band` is exactly equality on
    * (j, bkey), so candidate semantics are unchanged (no hashing, no
    * collisions).
    */
  def bandCol(j: Column, bkey: Column): Column =
    concat_ws(":", j.cast("string"), concat_ws(",", bkey.cast("array<string>")))

  /** Add the scalar `band` column to a (doc_id, j, bkey) relation. */
  def withBand(bands: DataFrame): DataFrame =
    bands.withColumn("band", bandCol(col("j"), col("bkey")))

  /** Persist a band-key relation (from [[graft.queries.Dedup.bandKeys]])
    * bucketed + sorted on the scalar band key.
    */
  def write(bands: DataFrame, table: String, buckets: Int = 8): Unit =
    Bucketing.writeBucketed(withBand(bands).select("doc_id", "band"),
      table, "band", buckets)

  /** LSH candidate pairs from the persisted index alone — the full
    * re-cluster shape. Zero-exchange self-join (merge hint pins the
    * SortMergeJoin the bucketing pays for).
    */
  def candidates(spark: SparkSession, table: String): DataFrame = {
    val t = spark.table(table)
    t.as("x").hint("merge").join(t.as("y"),
        col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  /** LSH candidate pairs of a (small) new band relation against the
    * persisted index ∪ itself — the incremental micro-batch shape,
    * semantically `(index ∪ new) ⋈ new` with `a_id < b_id`, decomposed
    * so the bucketing survives (a union would erase the output
    * partitioning property and reshuffle BOTH sides): the index⋈new
    * half shuffles only the small new side to the index's bucketing —
    * the historical side never moves — and the tiny new⋈new half
    * shuffles batch-sized relations.
    *
    * CALLER CONTRACT — in-order ids: the index⋈new arm only forms
    * pairs with `hist.doc_id < new.doc_id`, so every id in `newBands`
    * must EXCEED every id already in the index; a new doc with a
    * smaller id than an indexed near-duplicate would never form its
    * pair and the near-dup would be silently missed. This is the
    * keep-first semantics of the incremental pipeline (a verdict
    * depends only on smaller ids), and
    * [[graft.streaming.DocPipeline.processBatch]] enforces it loudly
    * (new min id vs stored max id) before indexing. Out-of-order
    * producers must re-key monotonically before using this shape.
    */
  def candidatesAgainst(spark: SparkSession, table: String,
      newBands: DataFrame): DataFrame =
    candidatesAgainstDf(spark.table(table), newBands, merge = true)

  /** The same decomposed `(hist ∪ new) ⋈ new` candidate join over
    * arbitrary band relations (hist already carries the scalar `band`
    * column; `new` is a raw (doc_id, j, bkey) relation). This is the
    * shape the incremental DocPipeline runs per micro-batch against its
    * path-based state store — same code, same in-order caller contract
    * as [[candidatesAgainst]]; the bucketed-table entry point above
    * additionally pins the merge join the bucketing pays for. Without
    * bucketing both arms are plain shuffle equi-joins, but the
    * decomposition still keeps the tiny new⋈new half off the history
    * relation, and upgrading the store to [[write]]'s bucketed layout
    * needs no caller change beyond reading via `spark.table`.
    */
  def candidatesAgainstDf(hist: DataFrame, newBands: DataFrame,
      merge: Boolean = false): DataFrame = {
    val nb = withBand(newBands).select("doc_id", "band")
    val h0 = hist.as("x")
    val histPairs = (if (merge) h0.hint("merge") else h0).join(nb.as("y"),
        col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
    val batchPairs = nb.as("x").join(nb.as("y"),
        col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
    histPairs.union(batchPairs).distinct()
  }
}
