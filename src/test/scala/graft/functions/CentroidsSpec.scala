package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The IVF assignment kernel (functions/Centroids.scala): the scan-side
  * argmax must be row-for-row identical to the declarative
  * crossJoin+window formulation it replaced (r11 — the window form
  * materializes n·nlist rows, n^1.5 at the production √n dial), and
  * must stay inside whole-stage codegen.
  */
class CentroidsSpec extends SparkSpec {

  import spark.implicits._

  private def emb(dir: String) =
    graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), Vectors.toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))

  test("kernel argmax == crossJoin+window argmax on the fixture") {
    val e = emb("/root/testdata/sf0.001")
    // build the codebook the way assignTo does
    val rows = e.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("v"), col("nrm")).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq
    val kernel = e.withColumn("nc", Vectors.nearestCentroid(col("v"), col("nrm"), rows))
      .select(col("vec_id"), col("nc.c_id").as("c_id"), col("nc.c_cos").as("c_cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val c = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy((Vectors.dot(col("v"), col("cv")) / (col("nrm") * col("cn"))).desc, col("c_id"))
    val window = e.crossJoin(broadcast(c))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id"),
        (Vectors.dot(col("v"), col("cv")) / (col("nrm") * col("cn"))).as("c_cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(kernel.length === window.length)
    kernel.zip(window).foreach { case (k, ww) => assert(k === ww) }
  }

  test("equal-cosine ties keep the smallest c_id (the oracle's ORDER BY cos DESC, c_id)") {
    // two IDENTICAL centroids under different ids: every vector ties
    // exactly, so the assignment must always pick id 5
    val cv = Seq(1.0, 0.0, 0.0)
    val book = Seq((5L, cv, 1.0), (9L, cv, 1.0))
    val got = Seq(Seq(0.5, 0.5, 0.0), Seq(-1.0, 2.0, 2.0), Seq(3.0, 0.0, 4.0))
      .map(Tuple1(_)).toDF("v")
      .withColumn("nrm", Vectors.norm(col("v")))
      .select(Vectors.nearestCentroid(col("v"), col("nrm"), book).getField("c_id"))
      .collect().map(_.getLong(0))
    assert(got.forall(_ === 5L), got.toSeq)
  }

  test("NaN cosines (zero-norm vector or centroid) follow the engines' sort order") {
    // Both engines' ORDER BY cos DESC place NaN ABOVE every double, so
    // a zero-norm centroid (NaN against everything) must win for every
    // vector even though NaN never compares greater under IEEE `>` —
    // the kernel's total-order compare reproduces that (ADVICE r11).
    val book = Seq((1L, Seq(1.0, 0.0), 1.0), (3L, Seq(0.0, 0.0), 0.0))
    val got = Seq(Seq(1.0, 1.0), Seq(0.0, 0.0)).map(Tuple1(_)).toDF("v")
      .withColumn("nrm", Vectors.norm(col("v")))
      .select(Vectors.nearestCentroid(col("v"), col("nrm"), book).as("nc"))
      .select(col("nc.c_id"), col("nc.c_cos")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // (1,1): finite cos vs c1, NaN vs c3 → NaN sorts first → c_id 3
    assert(got(0)._1 === 3L && got(0)._2.isNaN, got.toSeq)
    // (0,0): all-NaN → ties keep the SMALLEST c_id, not a stale default
    assert(got(1)._1 === 1L && got(1)._2.isNaN, got.toSeq)
  }

  test("kernel inlines into whole-stage codegen; dim mismatch raises") {
    val e = emb("/root/testdata/sf0.001")
    val rows = e.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("v"), col("nrm")).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq
    val df = e.select(Vectors.nearestCentroid(col("v"), col("nrm"), rows).as("nc"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_nearest_centroid")), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // a 3-dim codebook against the 64-dim corpus must fail loudly
    val bad = Seq((0L, Seq(1.0, 0.0, 0.0), 1.0))
    intercept[Exception] {
      e.select(Vectors.nearestCentroid(col("v"), col("nrm"), bad)).collect()
    }
  }

  test("empty codebook raises the kernels' descriptive require, not a bare head() error") {
    // ADVICE r12: the Column builders dereferenced cents.head before the
    // expression's own require could fire
    val c = col("v")
    val e1 = intercept[IllegalArgumentException] {
      Vectors.nearestCentroid(c, col("nrm"), Seq.empty)
    }
    assert(e1.getMessage.contains("graft_nearest_centroid: empty codebook"))
    val e2 = intercept[IllegalArgumentException] {
      Vectors.nearestCentroidsTopW(c, col("nrm"), Seq.empty, 2)
    }
    assert(e2.getMessage.contains("graft_nearest_centroids_topw: empty codebook"))
  }
}
