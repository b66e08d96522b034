package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted product-quantization artifact (r14, verdict ask #2) —
  * v11/v12's code relation and codebook as an on-disk index instead of
  * an in-query projection.
  *
  * At 100 TB the PQ code relation (m bytes/vector — 16 B at the
  * shipped dial, 32× under the float64 relation) IS the index you
  * keep: training and encoding are paid ONCE at build time, and every
  * query reads only `(vec_id, pq)` — the same narrow-artifact argument
  * as [[I8Index]], 4× smaller again. Re-training per query (v11's
  * in-query form) is a gate convenience, not the production path.
  *
  * Layout: codes at `path` — written `partitionBy("c_id")` when the
  * relation carries a coarse-list column (the IVFADC form: a probe of
  * `nprobe` lists then reads only those directories, the
  * [[IvfIndex]] pruning story at PQ-code granularity), plain parquet
  * otherwise (the flat v11 form). The codebook lands as a single-row
  * parquet at the SIBLING `<path>_codebook` (same rationale as
  * [[IvfIndex.writeWithCodebook]]: an underscore-prefixed child would
  * be invisible to Hadoop listings, a non-partition child would break
  * partition discovery) carrying `(m, k, cb, cents)` — `cents` is the
  * flat unit coarse-centroid array for residual (IVFADC) codebooks,
  * empty for direct ones. Parquet doubles round-trip bit-exact, so
  * encoding against a LOADED codebook reproduces the build's codes
  * (PqIndexSpec pins the round-trip and loaded-vs-fresh row equality).
  */
object PqIndex {

  /** Persist a code relation together with its codebook and params.
    * `cents`/`cids` (the flat unit coarse-centroid array and the c_ids
    * in the same dense order) are carried for IVFADC indexes so the
    * SERVING path can route queries without touching the embeddings'
    * own centroid derivation; both empty for direct (flat) indexes.
    */
  def write(codes: DataFrame, cb: Array[Double], m: Int, k: Int,
      path: String, cents: Array[Double] = Array.empty,
      cids: Array[Long] = Array.empty): Unit = {
    require(m > 0 && k > 0 && cb.length % (m * k) == 0,
      s"PqIndex.write: codebook shape mismatch (${cb.length} values, m=$m, k=$k)")
    require(cids.isEmpty == cents.isEmpty,
      "PqIndex.write: cents and cids must be provided together")
    val spark = codes.sparkSession
    // partitioned writes fan every task into every directory (measured
    // 5120 files for a 256-list 200k-row build — 20 tiny files per
    // list); repartitioning on the partition column first costs one
    // build-time shuffle and leaves ONE well-formed file per list, so
    // a probe opens nprobe files instead of nprobe × tasks
    // generation-manifest layout (r17, [[AtomicSwap.writeGen]]): data
    // lands as a generation under `path`, the manifest publish is the
    // commit, readers resolve through [[AtomicSwap.dataDir]]
    AtomicSwap.writeGen(spark, path) { gen =>
      if (codes.columns.contains("c_id"))
        codes.repartition(col("c_id")).write.mode("overwrite")
          .partitionBy("c_id").parquet(gen)
      else codes.write.mode("overwrite").parquet(gen)
    }
    import spark.implicits._
    // codebook through the generation layer too (r17): rebuild-over-
    // live must not overwrite it under an open reader
    AtomicSwap.writeGen(spark, path + "_codebook") { gen =>
      Seq((m, k, cb.toSeq, cents.toSeq, cids.toSeq))
        .toDF("m", "k", "cb", "cents", "cids")
        .repartition(1).write.mode("overwrite").parquet(gen)
    }
    // one-row FROZEN code count (r17) — the [[driftProbe]] baseline;
    // appends never rewrite it (the BmIndex `_stats` convention)
    AtomicSwap.writeGen(spark, path + "_stats") { gen =>
      codes.agg(count(lit(1)).as("n_codes")).repartition(1)
        .write.mode("overwrite").parquet(gen)
    }
  }

  /** Staleness probe for a maintained PQ/IVFADC index (r17 —
    * [[IvfIndex.driftProbe]] at code granularity): one row
    * `(n_frozen, n_now, appended_frac[, n_lists, max_list, mean_list,
    * list_skew])` — the list metrics only for the partitioned IVFADC
    * form. The PQ codebook AND the coarse routing book are frozen at
    * build, so appended volume decays BOTH quantization fit (codes of
    * new vectors quantize against sub-codebooks trained on the build
    * corpus) and routing balance; appended_frac is the budget for
    * each. Reads only (a constant column of) the narrow code relation
    * plus the one-row frozen count — never the embeddings.
    */
  def driftProbe(spark: SparkSession, path: String): DataFrame = {
    val codes = read(spark, path)
    val frozen = spark.read.parquet(AtomicSwap.dataDir(spark, path + "_stats"))
    if (codes.columns.contains("c_id")) {
      val lists = codes.groupBy("c_id").agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("n_now"), count(lit(1)).as("n_lists"),
          max(col("n")).as("max_list"),
          (sum(col("n")).cast("double") / count(lit(1))).as("mean_list"))
      frozen.crossJoin(lists)
        .select(col("n_codes").as("n_frozen"), col("n_now"),
          ((col("n_now") - col("n_codes")).cast("double") / col("n_now"))
            .as("appended_frac"),
          col("n_lists"), col("max_list"), col("mean_list"),
          (col("max_list").cast("double") / col("mean_list")).as("list_skew"))
    } else {
      frozen.crossJoin(codes.agg(count(lit(1)).as("n_now")))
        .select(col("n_codes").as("n_frozen"), col("n_now"),
          ((col("n_now") - col("n_codes")).cast("double") / col("n_now"))
            .as("appended_frac"))
    }
  }

  /** The persisted code relation. Partition-directory type inference
    * parses `c_id=N` as INT; cast back to the relation's BIGINT.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(AtomicSwap.dataDir(spark, path))
    if (df.columns.contains("c_id")) df.withColumn("c_id", col("c_id").cast("long"))
    else df
  }

  /** The persisted codebook: (cb, m, k, cents, cids). */
  def codebook(spark: SparkSession, path: String)
      : (Array[Double], Int, Int, Array[Double], Array[Long]) = {
    val r = spark.read.parquet(AtomicSwap.dataDir(spark, path + "_codebook")).head()
    (r.getAs[Seq[Double]]("cb").toArray, r.getAs[Int]("m"), r.getAs[Int]("k"),
      r.getAs[Seq[Double]]("cents").toArray, r.getAs[Seq[Long]]("cids").toArray)
  }

  /** Rewrite the code relation back to one file per list (r15 — the
    * maintenance companion to `appendToIvfAdcIndex`, PpIndex.compact's
    * story for the partitioned tier): every append adds a file into
    * each touched `c_id=` directory, so after many deltas a probe
    * opens nprobe × appends files instead of nprobe. Rows and the
    * codebook sibling are untouched. r17: generation-based
    * ([[AtomicSwap.writeGen]]) — the rewrite reads the current
    * generation straight from the durable source into the NEXT
    * generation and publishes a manifest naming it, never an
    * overwrite-in-place, and safe to run concurrently with READERS
    * (a reader that resolved the old generation keeps complete files
    * until the compact after this one). WRITERS are not: append and
    * compact must still be serialized — [[AtomicSwap.commitAppend]]
    * fails a racing append loudly (r18, ADVICE).
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val snap = spark.read.parquet(AtomicSwap.dataDir(spark, path))
    AtomicSwap.writeGen(spark, path) { gen =>
      if (snap.columns.contains("c_id"))
        snap.withColumn("c_id", col("c_id").cast("long"))
          .repartition(col("c_id")).write.mode("overwrite")
          .partitionBy("c_id").parquet(gen)
      else snap.write.mode("overwrite").parquet(gen)
    }
  }
}
