package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.PqIndex

/** The persisted PQ artifact (r14, verdict ask #2): `buildPqIndex`
  * must round-trip the codebook and codes bit-exactly through parquet,
  * the indexed retrieval path (`knnPqIndexed` — loads, never retrains)
  * must reproduce the fresh in-query path ROW FOR ROW, and the IVFADC
  * form's partitioned codes must leave the probe scan reading only the
  * probed c_id directories' files.
  */
class PqIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val qPred = col("vec_id") >= 300 && col("vec_id") < 310

  test("build → load round-trips codebook and codes bit-exactly; indexed == fresh") {
    val path = java.nio.file.Files.createTempDirectory("pqidx").toString + "/index"
    val cb = Similarity.buildPqIndex(spark, dir, path, m = 16, k = 16)

    // 1. codebook + params survive parquet bit-exactly
    val (cbL, mL, kL, centsL, _) = PqIndex.codebook(spark, path)
    assert((mL, kL) === ((16, 16)))
    assert(cbL.toSeq === cb.toSeq, "codebook changed across persist/load")
    assert(centsL.isEmpty, "flat (non-residual) index must carry no centroids")

    // 2. persisted codes == fresh encoding against the loaded codebook
    val e = Similarity.emb(spark, dir)
    def cmap(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "pq").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val persisted = cmap(PqIndex.read(spark, path))
    val fresh = cmap(e.select(col("vec_id"),
      graft.functions.Vectors.pqEncode(col("v"), col("nrm"), cbL, 16, 16).as("pq")))
    assert(persisted.size === fresh.size)
    assert(persisted === fresh, "loaded-codebook encoding diverged from the index")

    // 3. the indexed two-phase path == the fresh path row for row
    def rmap(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "rank", "neighbor_id", "cosine").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val qRows = e.filter(qPred).orderBy("vec_id")
      .select(col("vec_id"), col("v"), col("nrm")).collect()
    val freshTop3 = rmap(Similarity.pqRerankTop3(e,
      Similarity.pqAdcScores(spark,
        e.select(col("vec_id"),
          graft.functions.Vectors.pqEncode(col("v"), col("nrm"), cb, 16, 16).as("pq")),
        cb, 16, 16, qRows),
      qPred, 50))
    val indexedTop3 = rmap(Similarity.knnPqIndexed(spark, dir, path, qPred))
    assert(indexedTop3.size === freshTop3.size)
    assert(indexedTop3 === freshTop3, "indexed PQ retrieval diverged from fresh")

    // 4. the code scan never reads the codebook sibling
    val files = PqIndex.read(spark, path).inputFiles
    assert(files.nonEmpty && !files.exists(_.contains("_codebook")),
      "codebook leaked into the code scan")
  }

  test("IVFADC form: indexed == inline, probe scan prunes to probed c_id dirs") {
    val path = java.nio.file.Files.createTempDirectory("pqivfadc").toString + "/index"
    def rset(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "rank", "neighbor_id", "cosine").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val inline = rset(Similarity.ivfAdcTop3(spark, dir, m = 16, k = 16,
      nprobe = 4, frontier = 50, qPred = qPred))
    val indexed = rset(Similarity.ivfAdcTop3(spark, dir, m = 16, k = 16,
      nprobe = 4, frontier = 50, qPred = qPred, indexPath = Some(path)))
    assert(indexed === inline, "persisted IVFADC diverged from the inline form")

    // residual index carries the coarse centroids + ids for serving
    val (_, _, _, cents, cids) = PqIndex.codebook(spark, path)
    assert(cents.length === 16 * 64, "residual index must persist unit coarse centroids")
    assert(cids.length === 16, "residual index must persist the coarse c_ids")

    // the SERVING path (loads everything from the index) == inline
    val served = rset(Similarity.ivfAdcServe(spark, dir, path,
      nprobe = 4, frontier = 50, qPred = qPred))
    assert(served === inline, "warm IVFADC serving diverged from the inline form")

    // layout: codes land under c_id= partition directories, so a probe
    // of nprobe lists READS exactly those directories — checked at
    // execution level via input_file_name (the IvfIndexSpec proof;
    // DataFrame.inputFiles would list the whole relation pre-pruning)
    val codes = PqIndex.read(spark, path)
    assert(codes.inputFiles.nonEmpty &&
      codes.inputFiles.forall(_.contains("c_id=")), "codes not partitioned by c_id")
    val probedFiles = codes.filter(col("c_id").isin(3L, 7L))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(probedFiles.nonEmpty && probedFiles.forall(f =>
      f.contains("c_id=3") || f.contains("c_id=7")),
      s"probe read files outside its probed c_id directories: " +
        probedFiles.filterNot(f => f.contains("c_id=3") || f.contains("c_id=7")).mkString(", "))
  }
}
