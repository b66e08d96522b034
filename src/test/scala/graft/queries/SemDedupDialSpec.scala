package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** v08's scale dial, evidenced deterministically: SemDeDup's cost model
  * is the within-cluster pair volume Σ C(|cluster|, 2) ≈ n²/(2·nlist),
  * so growing nlist is THE knob that caps the cluster-local quadratic
  * (the fixture query pins nlist=16 only so the hand-written oracle
  * stays exact; `ivfAssign(nlist = ...)` is the production recipe).
  * Timing assertions flake; pair counts don't — this spec pins the
  * cost model itself on a corpus big enough to separate the dial.
  */
class SemDedupDialSpec extends SparkSpec {

  import spark.implicits._

  private def pairVolume(dir: String, nlist: Int): Long =
    Similarity.ivfAssign(spark, dir, nlist)
      .groupBy("c_id").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * (col("n") - 1) / 2).cast("long")).head().getLong(0)

  test("growing nlist toward sqrt(n) collapses the within-cluster pair volume") {
    // 5000 deterministic 8-dim vectors (varied directions so centroid
    // assignment spreads); nlist 16 vs 70 ≈ sqrt(5000)
    val n = 5000
    val vecs = (0 until n).map { i =>
      val v = Array.tabulate(8)(d =>
        math.sin(0.7 * (i * 8 + d) + 0.13 * d).toFloat)
      (i.toLong, v.toSeq, i % 7)
    }
    val dirTmp = java.nio.file.Files.createTempDirectory("semdial").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dirTmp/embeddings.parquet")

    val p16 = pairVolume(dirTmp, 16)
    val p70 = pairVolume(dirTmp, 70)
    // perfect balance would give ratios 16/70 ≈ 0.23; real assignment
    // is lumpy, so assert the conservative half-bound plus the
    // absolute scale sanity (p16 near n²/32 within a lumpiness factor)
    assert(p70 * 2 < p16, s"nlist dial must cut pair volume: $p70 !<< $p16")
    assert(p16 > n.toLong * n / 2 / 16 / 4, s"p16=$p16 implausibly small")
  }

  test("the dial changes cost, not semantics: keep-first verdict valid at any nlist") {
    // on the fixture corpus, re-derive v08's keep rule independently at
    // nlist=32 (off the pinned 16): a vector is dropped iff a
    // smaller-id member of ITS cluster sits at cosine >= 0.3
    val dir = "/root/testdata/sf0.01"
    val assign = Similarity.ivfAssign(spark, dir, 32)
      .select(col("c_id"), col("vec_id"), col("v"), col("nrm"))
    val a = assign.select(col("c_id"), col("vec_id").as("a_id"),
      col("v").as("va"), col("nrm").as("na"))
    val b = assign.select(col("c_id"), col("vec_id").as("b_id"),
      col("v").as("vb"), col("nrm").as("nb"))
    val dropped = a.join(b, Seq("c_id")).filter(col("a_id") < col("b_id"))
      .filter((graft.functions.Vectors.dot(col("va"), col("vb"))
        / (col("na") * col("nb"))) >= 0.3)
      .select(col("b_id")).distinct().collect().map(_.getLong(0)).toSet
    val all = assign.select("vec_id").collect().map(_.getLong(0)).toSet
    // smallest id of every cluster is always kept
    val clusterMins = assign.groupBy("c_id").agg(min("vec_id").as("m"))
      .collect().map(_.getLong(1)).toSet
    assert(clusterMins.intersect(dropped).isEmpty, "a cluster's smallest id can never drop")
    assert(dropped.subsetOf(all))

    // and the ENGINE's semDedup at the same off-pin dial (nlist=32 →
    // pairSalt 4, the salted join) must reproduce this unsalted
    // reference derivation verdict-for-verdict: salting is a pure
    // parallelism move, every (a, b) pair still meets exactly once
    val engine = Similarity.semDedup(spark, dir, nlist = 32)
      .select("vec_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(engine.keySet === all)
    all.foreach { vid =>
      val expect = if (dropped(vid)) 0L else 1L
      assert(engine(vid) === expect, s"vec $vid: salted semDedup diverged from unsalted reference")
    }
  }

  test("pairSalt derives from the dial alone: pinned-16 salts, sqrt-n dials don't") {
    assert(Similarity.pairSalt(16) === 8)
    assert(Similarity.pairSalt(32) === 4)
    assert(Similarity.pairSalt(128) === 1)
    assert(Similarity.pairSalt(448) === 1) // the 100x sqrt-n dial: salt-free
  }
}
