package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Persisted int8 code index — v09's phase-1 relation as an on-disk
  * artifact instead of an inline projection.
  *
  * At 100 TB the float embedding relation is what does NOT fit: a
  * 1024-dim float32 corpus is 4 KB/row, its int8 codes 1 KB — and
  * parquet dictionary+RLE squeezes the small-int values further. The
  * quantized scan (candidate generation) should therefore read a
  * relation that contains ONLY `(vec_id, qc)`: columnar pruning alone
  * cannot help if codes are carried as an extra column of the float
  * table, because the scan still opens the fat files. A separate
  * code-only index directory keeps phase-1 I/O proportional to the
  * codes, and phase 2 fetches floats BY ID from the primary table for
  * the tiny surviving frontier.
  *
  * Build is one shuffle-free pass over the embeddings (quantize in the
  * scan's projection, write); rebuild after re-embedding is the same
  * pass. `I8IndexSpec` pins that (a) a scan of the index reads none of
  * the float files, (b) candidates served from the index are
  * bit-identical to v09's inline phase 1, and (c) the index directory
  * is materially smaller than the float relation on disk.
  *
  * WRITE-ONCE BY CONTRACT (r18, verdict ask #7): this index has no
  * append path and writes directly at the artifact path, OUTSIDE the
  * [[AtomicSwap]] generation layout — safe only because nothing ever
  * mutates it after build. Any future append/compact path MUST first
  * route the writes through [[AtomicSwap.writeGen]]/[[AtomicSwap
  * .commitAppend]] (see the fence note in AtomicSwap's header).
  */
object I8Index {

  /** The code relation of an embeddings table: `(vec_id, qc)` with
    * `qc = QuantizeUnitI8(v / ||v||)` — exactly v09's phase-1 input.
    */
  def codes(emb: DataFrame): DataFrame = {
    val v = Vectors.toDoubleVec(col("embedding"))
    emb.select(col("vec_id"),
      Vectors.quantizeI8(v, sqrt(Vectors.dot(v, v))).as("qc"))
  }

  /** Persist the code-only index (one narrow pass, no shuffle). */
  def write(emb: DataFrame, path: String): Unit =
    codes(emb).write.mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
