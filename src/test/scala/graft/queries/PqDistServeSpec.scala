package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed query side for PQ/IVFADC serving (r15, verdict ask #3).
  * The correctness story is ROW EQUALITY against the driver-side
  * serving paths: [[Similarity.knnPqIndexedDist]] and
  * [[Similarity.ivfAdcServeDist]] replace the driver qRows/LUT/probe
  * materialization with kernels ([[graft.functions.PqLuts]],
  * [[graft.functions.PqProbes]], [[graft.functions.PqAdcFromLut]])
  * built on the SAME IEEE fold sequences and total-order tie-breaks,
  * so the two paths must agree bit-for-bit — ids AND cosines — not
  * merely approximately. Also pins the empty-query contract the
  * serving entry points grew with the distributed path (an empty
  * predicate is a valid batch, not a LUT crash).
  */
class PqDistServeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val qPred = col("vec_id") >= 300 && col("vec_id") < 310

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "neighbor_id", "cosine", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  test("flat PQ: distributed query side == driver path, bit-for-bit") {
    val path = java.nio.file.Files.createTempDirectory("pqdist").toString + "/idx"
    Similarity.buildPqIndex(spark, dir, path)
    val driver = rows(Similarity.knnPqIndexed(spark, dir, path, qPred))
    val dist = rows(Similarity.knnPqIndexedDist(spark, dir, path, qPred))
    assert(driver.nonEmpty)
    assert(dist === driver, "distributed flat-PQ serving diverged from the driver path")
  }

  test("IVFADC: distributed probes + LUTs == driver path, bit-for-bit") {
    val path = java.nio.file.Files.createTempDirectory("ivfadcdist").toString + "/idx"
    Similarity.buildIvfAdcIndex(spark, dir, path)
    val np = Similarity.V12Nprobe
    val fr = Similarity.V12Frontier
    val driver = rows(Similarity.ivfAdcServe(spark, dir, path, np, fr, qPred))
    val dist = rows(Similarity.ivfAdcServeDist(spark, dir, path, np, fr, qPred))
    assert(driver.nonEmpty)
    assert(dist === driver, "distributed IVFADC serving diverged from the driver path")
    // the agreement must hold at a probe width where the paths COULD
    // diverge through routing (nprobe < nlist — at full width any
    // routing bug would be masked)
    assert(np < 16)
  }

  test("empty query predicate returns an empty result, not a LUT error") {
    val path = java.nio.file.Files.createTempDirectory("pqempty").toString + "/idx"
    Similarity.buildIvfAdcIndex(spark, dir, path)
    val none = col("vec_id") < lit(-1L)
    for (df <- Seq(
        Similarity.knnPqIndexed(spark, dir, path, none),
        Similarity.knnPqIndexedDist(spark, dir, path, none),
        Similarity.ivfAdcServe(spark, dir, path, 8, 100, none),
        Similarity.ivfAdcServeDist(spark, dir, path, 8, 100, none))) {
      assert(df.count() === 0)
      assert(df.columns.toSeq === Seq("q_id", "neighbor_id", "cosine", "rank"))
    }
  }

  test("appending an already-indexed vec_id fails loudly") {
    val path = java.nio.file.Files.createTempDirectory("ivfadcdup").toString + "/idx"
    Similarity.buildIvfAdcIndex(spark, dir, path)
    val dup = graft.Tables(spark, dir, "embeddings").filter(col("vec_id") === 0)
    val e = intercept[IllegalArgumentException] {
      Similarity.appendToIvfAdcIndex(spark, dup, path)
    }
    assert(e.getMessage.contains("already indexed"))
  }
}
