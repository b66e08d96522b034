package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.IvfIndex

/** The trained-fine sharded path (r14, verdict asks #3/#6): the v10d
  * gate's contracts hold structurally — the persisted trained book
  * round-trips, every shard owns >= 1 fine centroid (the ADVICE-r13
  * memberless hazard, checked on the DISK layout), the sharded
  * assignment at w = nSup collapses bit-exactly to the single-level
  * argmax over the same loaded book, and the v10d query itself reports
  * all-green flags.
  */
class TrainedShardedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("trained build: shards non-empty, w=nSup == single-level, v10d flags green") {
    val path = java.nio.file.Files.createTempDirectory("trainedsharded").toString + "/idx"
    Similarity.buildTwoLevelIndexTrained(spark, dir, path, nlist = 64, iters = 2)

    // every persisted shard owns at least one fine centroid, ids dense
    val fine = IvfIndex.fineShards(spark, path)
    val sup = IvfIndex.supers(spark, path)
    val supIds = sup.select("s_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(supIds === supIds.indices.map(_.toLong), "super ids not dense")
    val shardIds = fine.select("s_id").distinct().collect().map(_.getLong(0)).toSet
    assert(supIds.toSet === shardIds,
      s"memberless supers persisted: ${supIds.toSet.diff(shardIds)}")
    assert(fine.count() === 64L)

    // sharded at w = nSup reproduces the single-level argmax over the
    // SAME loaded book — ids and cosines (the v10c equality, trained)
    val e = Similarity.emb(spark, dir)
    def amap(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "c_id", "c_cos").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val single = amap(Similarity.assignTo(e, fine.select("c_id", "cv", "cn")))
    val sharded = amap(
      Similarity.twoLevelAssignSharded(spark, dir, path, w = supIds.size))
    assert(sharded.size === single.size)
    assert(sharded === single, "trained sharded w=nSup diverged from single-level")
  }

  test("the v10d gate query reports all-green flags at the gate SF") {
    val row = graft.SparkEntry.queries("v10d_sharded_trained")(spark, dir).head()
    val n = Similarity.emb(spark, dir).count()
    assert(row.getLong(row.fieldIndex("n_vecs")) === n)
    assert(row.getLong(row.fieldIndex("frac_ok")) === 1L, "w=2 match under floor")
    assert(row.getLong(row.fieldIndex("exact_at_full")) === 1L)
    assert(row.getLong(row.fieldIndex("never_better")) === 1L)
  }
}
