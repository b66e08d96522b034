package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.IvfIndex

/** Trained-codebook persistence (r12): `Similarity.buildTrainedIndex`
  * must round-trip the trained centroids bit-exactly through parquet,
  * re-assignment against the LOADED codebook must reproduce the
  * persisted assignment relation, and the persisted-index ANN path
  * must not lose recall vs the first-nlist seed at equal nprobe (the
  * in-memory inequality IvfTrainSpec/SimilarityRecallSpec already pin,
  * here proven through disk).
  */
class IvfPersistSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("train → persist → load → assign round-trips deterministically; recall >= seed") {
    val path = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/index"
    val trained = Similarity.buildTrainedIndex(spark, dir, path, nlist = 16, iters = 2)

    // 1. the codebook survives parquet bit-exactly (doubles round-trip)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("c_id", "cv", "cn").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toList, r.getDouble(2)))
        .sortBy(_._1).toList
    val loaded = IvfIndex.codebook(spark, path)
    assert(key(loaded) === key(trained), "codebook changed across persist/load")

    // 2. re-assignment against the LOADED codebook == the persisted
    // assignment relation (deterministic given centroids — the
    // incremental-add contract: new vectors route like the build did)
    def amap(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "c_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val persisted = amap(IvfIndex.read(spark, path))
    val reassigned = amap(Similarity.ivfAssignFromIndex(spark, dir, path))
    assert(reassigned.size === persisted.size)
    assert(reassigned === persisted, "loaded-codebook assignment diverged from the index")

    // 3. persisted-path ANN recall at nprobe=2 >= the inline seed path
    // on the same queries (training must not lose probe quality)
    val qPred = col("vec_id") >= 100 && col("vec_id") < 110
    val exact = Similarity.exactTopKWhere(spark, dir, qPred, 3)
      .select("q_id", "neighbor_id")
    def hits(ann: org.apache.spark.sql.DataFrame): Long =
      Similarity.recallOf("x", exact, ann)
        .select("n_hits").head().getLong(0)
    val seedHits = hits(Similarity.knnIvf(spark, dir, nprobe = 2))
    val trainedHits = hits(
      Similarity.knnIvfIndexed(spark, dir, path, qPred, nprobe = 2))
    assert(trainedHits >= seedHits,
      s"persisted trained index lost recall: $trainedHits < $seedHits of ${10 * 3}")

    // 4. the index scan itself never reads the codebook files
    val files = IvfIndex.read(spark, path).inputFiles
    assert(files.nonEmpty && !files.exists(_.contains("_codebook")),
      "codebook leaked into the assignment scan")
  }

  test("append routes new vectors exactly as a same-codebook rebuild; duplicates fail loudly") {
    val path = java.nio.file.Files.createTempDirectory("ivfappend").toString + "/index"
    val emb = graft.Tables(spark, dir, "embeddings")
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val cut = maxId / 2

    // build over the first half only (trained, so the codebook is NOT
    // derivable from the appended rows — the artifact must carry it)
    val halfDir = java.nio.file.Files.createTempDirectory("ivfappenddata").toString
    emb.filter(col("vec_id") <= cut).write.parquet(s"$halfDir/embeddings.parquet")
    Similarity.buildTrainedIndex(spark, halfDir, path, nlist = 16, iters = 2)

    Similarity.appendToIvfIndex(spark, emb.filter(col("vec_id") > cut), path)

    def amap(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "c_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = amap(IvfIndex.read(spark, path))
    assert(after.size === emb.count())
    // a rebuild against the SAME persisted codebook over the full
    // corpus places every vector identically
    val rebuilt = amap(Similarity.ivfAssignFromIndex(spark, dir, path))
    assert(after === rebuilt, "append diverged from a same-codebook rebuild")

    val e = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(spark, emb.filter(col("vec_id") === 0), path)
    }
    assert(e.getMessage.contains("already indexed"))
  }
}
