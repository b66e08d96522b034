package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The maintenance lifecycle behind the v14 gate (r18, verdict ask
  * #4), pinned at the property level: the gate's driver hash proves
  * the composed OUTPUT; this spec proves the load-bearing mechanics —
  * the drift probe fires at the appended volume and clears after the
  * rebuild, and a serving reader planned BEFORE the rebuild returns
  * bit-identical rows when evaluated AFTER it (the ManifestSpec
  * pinned-reader property, here through a full index-serving plan
  * across a retrain-rebuild, not a bare parquet scan).
  */
class MaintenanceLoopSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("probe fires at 40% appended, clears post-rebuild; a reader " +
      "planned pre-rebuild serves bit-identical rows post-rebuild") {
    val path = java.nio.file.Files.createTempDirectory("v14spec")
      .toString + "/idx"
    val e = Similarity.emb(spark, dir)
    val raw = graft.Tables(spark, dir, "embeddings")
    val maxId = raw.agg(max(col("vec_id"))).head().getLong(0)
    val cut = maxId * 6 / 10

    // build at 60%, append the rest under the frozen seed book
    val eb = e.filter(col("vec_id") <= cut)
    val book0 = Similarity.centroids(eb, 16)
    graft.sources.IvfIndex.writeWithCodebook(
      Similarity.assignTo(eb, book0).select("vec_id", "c_id", "v", "nrm"),
      book0, path)
    Similarity.appendToIvfIndex(spark,
      raw.filter(col("vec_id") > cut).select("vec_id", "label", "embedding"),
      path)

    val fracPre = graft.sources.IvfIndex.driftProbe(spark, path)
      .select("appended_frac").head().getDouble(0)
    assert(fracPre > 0.25, s"probe should fire at 40% appended (got $fracPre)")

    // plan the pre-rebuild reader and EVALUATE it now — the baseline
    val qPred = col("vec_id") >= 100 && col("vec_id") < 110
    val pinned = Similarity.knnIvfOver(e,
      graft.sources.IvfIndex.codebook(spark, path),
      graft.sources.IvfIndex.read(spark, path), qPred, 2)
    val before = pinned.collect()
    assert(before.length === 30)

    // rebuild: retrain (deterministic Lloyd) + writeGen publish
    val trained = Similarity.ivfTrainOver(spark, e, 16, 3)
    graft.sources.IvfIndex.writeWithCodebook(
      Similarity.assignTo(e, trained).select("vec_id", "c_id", "v", "nrm"),
      trained, path)

    // the pinned plan re-evaluates against its already-resolved files
    // — bit-identical rows, not an exception, not the new generation
    val after = pinned.collect()
    assert(after.toSeq === before.toSeq,
      "pre-rebuild reader must serve identical rows across the rebuild")

    val fracPost = graft.sources.IvfIndex.driftProbe(spark, path)
      .select("appended_frac").head().getDouble(0)
    assert(fracPost === 0.0,
      s"probe must clear after the rebuild froze new stats (got $fracPost)")

    // and a FRESH reader resolves the retrained generation: its
    // codebook is the trained book, not the seed book
    val freshBook = graft.sources.IvfIndex.codebook(spark, path)
      .orderBy("c_id").collect().map(_.getSeq[Double](1))
    val trainedRows = trained.orderBy("c_id").collect()
      .map(_.getSeq[Double](1))
    assert(freshBook.toSeq === trainedRows.toSeq,
      "fresh readers must see the retrained codebook")
  }
}
