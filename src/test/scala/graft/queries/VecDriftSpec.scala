package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{IvfIndex, PqIndex}

/** Staleness probes for the MAINTAINED vector indexes (r17 — the
  * BmIndex.driftProbe / Dedup.ppIndexDrift convention completing the
  * matrix across all four index families): the frozen one-row count
  * written at build, the appended fraction and routing-balance
  * metrics a maintenance job thresholds, and the frozen-across-append
  * contract.
  */
class VecDriftSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("IVF drift probe: appended fraction and list balance, frozen baseline") {
    val path = java.nio.file.Files.createTempDirectory("ivfdrift").toString + "/idx"
    val emb = graft.Tables(spark, dir, "embeddings")
    val n0 = emb.count()
    // build on ~2/3 of the corpus (trained book over the full corpus —
    // what freezes is the BOOK, the membership is the build's)
    val cents = Similarity.ivfTrain(spark, dir, 16)
    IvfIndex.writeWithCodebook(
      Similarity.ivfAssignWith(spark, dir, cents)
        .filter(col("vec_id") % 3 =!= 0),
      cents, path)

    val d0 = IvfIndex.driftProbe(spark, path).head()
    assert(d0.getAs[Long]("n_frozen") === d0.getAs[Long]("n_now"))
    assert(d0.getAs[Double]("appended_frac") === 0.0)
    assert(d0.getAs[Double]("list_skew") >= 1.0)

    Similarity.appendToIvfIndex(spark, emb.filter(col("vec_id") % 3 === 0), path)
    val d1 = IvfIndex.driftProbe(spark, path).head()
    assert(d1.getAs[Long]("n_now") === n0, "append should reach the full corpus")
    assert(d1.getAs[Long]("n_frozen") === d0.getAs[Long]("n_frozen"),
      "the frozen baseline must not move on append")
    val frac = d1.getAs[Double]("appended_frac")
    assert(frac > 0.2 && frac < 0.5, s"expected ~1/3 appended, got $frac")
    assert(d1.getAs[Double]("mean_list") > d0.getAs[Double]("mean_list"),
      "appends must show up as fatter lists")
  }

  test("PQ drift probe: flat form reports counts; IVFADC form adds list balance") {
    val flat = java.nio.file.Files.createTempDirectory("pqdrift").toString + "/idx"
    Similarity.buildPqIndex(spark, dir, flat)
    val df = PqIndex.driftProbe(spark, flat).head()
    assert(df.getAs[Long]("n_frozen") === df.getAs[Long]("n_now"))
    assert(df.getAs[Double]("appended_frac") === 0.0)
    assert(!PqIndex.driftProbe(spark, flat).columns.contains("list_skew"))

    val base = java.nio.file.Files.createTempDirectory("adcdrift").toString
    val adc = s"$base/idx"
    val emb = graft.Tables(spark, dir, "embeddings")
    val cut = emb.agg(expr("percentile(vec_id, 0.75)")).head().getDouble(0).toLong
    // build on the prefix (the IvfAdcAppendSpec half-dir recipe),
    // append the tail, probe
    emb.filter(col("vec_id") <= cut)
      .write.parquet(s"$base/prefixdata/embeddings.parquet")
    Similarity.buildIvfAdcIndex(spark, s"$base/prefixdata", adc)
    Similarity.appendToIvfAdcIndex(spark, emb.filter(col("vec_id") > cut), adc)
    val da = PqIndex.driftProbe(spark, adc).head()
    assert(da.getAs[Double]("appended_frac") > 0.1)
    assert(da.getAs[Double]("list_skew") >= 1.0)
    assert(da.getAs[Long]("n_lists") <= 16L)
  }
}
