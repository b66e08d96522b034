package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two-level IVF assignment (Similarity.twoLevelAssign — SCALE.md's
  * tier above the embedded-codebook ceiling, prototyped in r12):
  *
  *  - with `w` = the full super count, every fine centroid is
  *    reachable, so the two-level argmax must equal the single-level
  *    kernel ROW FOR ROW (ids and cosines — same IEEE sequence, same
  *    total-order tie-breaks);
  *  - with small `w` (the multi-probe trade), the picked cosine can
  *    never exceed the single-level optimum, every vector still gets
  *    exactly one assignment, and the match rate stays high on the
  *    fixture (pinned floor).
  */
class TwoLevelIvfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val nlist = 64 // → 8 supers

  private def singleLevel(): Map[Long, (Long, Double)] = {
    val e = Similarity.emb(spark, dir)
    Similarity.assignTo(e, Similarity.centroids(e, nlist))
      .select("vec_id", "c_id", "c_cos").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
  }

  private def twoLevel(w: Int): Map[Long, (Long, Double)] = {
    val e = Similarity.emb(spark, dir)
    Similarity.twoLevelAssign(spark, dir, Similarity.centroids(e, nlist), w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
  }

  test("w = all supers reproduces the single-level argmax row for row") {
    val single = singleLevel()
    val two = twoLevel(w = 8)
    assert(two.size === single.size)
    assert(two === single, "two-level with full probe diverged from the kernel argmax")
  }

  test("multi-probe: one row per vector, cosine never beats the optimum, accuracy monotone in w") {
    val single = singleLevel()
    val rates = Seq(1, 2, 4).map { w =>
      val two = twoLevel(w)
      assert(two.size === single.size, s"w=$w: a vector lost (or duplicated) its assignment")
      two.foreach { case (vid, (_, cos)) =>
        // two-level can only pick from probed shards — never better
        assert(cos <= single(vid)._2,
          s"w=$w vec $vid: two-level cosine $cos beats the optimum ${single(vid)._2}")
      }
      val m = two.count { case (vid, (cid, _)) => single(vid)._1 == cid }
      m.toDouble / two.size
    }
    info(f"exact-assignment match rate by w=1/2/4: ${rates(0)}%.4f ${rates(1)}%.4f ${rates(2)}%.4f")
    // the synthetic fixture is near-ISOTROPIC (cosines to all centroids
    // nearly equal), the hardest case for coarse routing — observed
    // 0.41/0.54/0.77; real clustered embeddings route far better. The
    // contracts that must hold regardless: accuracy grows with w (the
    // multi-probe dial works) and a single probe still beats 1/nSup
    // random routing by a wide margin
    assert(rates(0) > 2.0 / 8 && rates(1) >= rates(0) && rates(2) >= rates(1),
      s"multi-probe dial broken: rates $rates")
  }

  test("coarse router and shard argmax stay inside whole-stage codegen") {
    val e = Similarity.emb(spark, dir)
    val plan = Similarity.twoLevelAssign(spark, dir,
      Similarity.centroids(e, nlist), 2).queryExecution.executedPlan.toString
    assert(plan.contains("graft_nearest_centroids_topw"), plan)
    assert(plan.contains("graft_shard_nearest"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("topW kernel at w = nlist enumerates the exact (cos DESC, c_id ASC) argsort") {
    // the kernel doc's strongest claim, pinned directly: for every
    // vector, the full-width output must equal a reference argsort of
    // the SAME IEEE cosine sequence under the total order
    // java.lang.Double.compare (NaN first on DESC, -0.0 == 0.0),
    // ties broken on ascending c_id
    import org.apache.spark.sql.functions.col
    val e = Similarity.emb(spark, dir)
    val book = Similarity.centroids(e, 16)
      .select(col("c_id"), col("cv"), col("cn")).orderBy("c_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val got = e.select(col("vec_id"),
        graft.functions.Vectors.nearestCentroidsTopW(col("v"), col("nrm"),
          book.map { case (id, cv, cn) => (id, cv.toSeq, cn) }.toSeq, w = 16).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val vecs = e.select(col("vec_id"), col("v"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    vecs.foreach { case (vid, v, nrm) =>
      val expect = book.map { case (cid, cv, cn) =>
        var acc = 0.0
        var i = 0
        while (i < v.length) { acc += v(i) * cv(i); i += 1 }
        var cos = acc / (nrm * cn)
        if (cos == 0.0) cos = 0.0
        (cid, cos)
      }.sortWith { case ((ia, ca), (ib, cb)) =>
        val c = java.lang.Double.compare(ca, cb)
        if (c != 0) c > 0 else ia < ib
      }.map(_._1).toSeq
      assert(got(vid) === expect, s"vec $vid: kernel argsort diverged")
    }
  }
}
