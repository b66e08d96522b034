package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Vectors._

/** The LSH-width dial: at 100 TB the fix for v05/v06's growing buckets
  * is WIDENING the bucket key (more hyperplanes), not a new algorithm.
  * The plane hash depends only on the plane index, so an n+k-bit
  * bucket refines the n-bit bucket (its low n bits are the same) —
  * candidates at more bits are a strict SUBSET, never a different set.
  * This spec makes that dial executable: sub-bucketing holds on the
  * real fixtures and the candidate volume actually shrinks.
  */
class LshDialSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def pairsAt(bits: Int): Set[(Long, Long)] = {
    val e = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("b", lshBucket(col("v"), bits))
    e.as("x").join(e.as("y"),
        col("x.b") === col("y.b") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("widening the bucket key refines candidates on the fixtures (subset)") {
    val p8 = pairsAt(8)
    val p12 = pairsAt(12)
    assert(p8.nonEmpty)
    assert(p12.subsetOf(p8),
      s"12-bit candidates are not a subset of 8-bit: ${(p12 -- p8).take(3)}")
    // The shrink itself is data-dependent (tight clusters can saturate:
    // every wider plane agrees within a cluster) — asserted on the
    // fixtures only as non-increase; the strict shrink is pinned below
    // on isotropic data, where the dial always has room to act. This
    // very probe caught the round-6 plane degeneracy: with the
    // separable parity signs, widening NEVER changed anything because
    // all planes were one plane.
    assert(p12.size <= p8.size)
  }

  test("on isotropic data, widening strictly shrinks the candidate volume") {
    import spark.implicits._
    // deterministic pseudo-random unit-ish vectors, no cluster structure
    def vec(id: Long): Array[Double] = {
      var x = id * 6364136223846793005L + 1442695040888963407L
      Array.fill(64) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        (x >>> 11).toDouble / (1L << 53).toDouble - 0.5
      }
    }
    val e = spark.createDataset((0L until 1000L).map(i => (i, vec(i)))).toDF("vec_id", "v")
    def pairs(bits: Int): Long = {
      val b = e.withColumn("b", lshBucket(col("v"), bits))
      b.as("x").join(b.as("y"),
          col("x.b") === col("y.b") && col("x.vec_id") < col("y.vec_id")).count()
    }
    val p8 = pairs(8); val p12 = pairs(12)
    assert(p8 > 0)
    assert(p12 < p8, s"widening did not shrink isotropic candidates: $p12 vs $p8")
  }

  test("bucket ids agree on the shared low bits") {
    val e = graft.Tables(spark, dir, "embeddings")
      .select(toDoubleVec(col("embedding")).as("v"))
      .select(lshBucket(col("v"), 8).as("b8"), lshBucket(col("v"), 12).as("b12"))
    assert(e.filter(pmod(col("b12"), lit(256)) =!= col("b8")).count() === 0L)
  }
}
