package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Vectors._

/** The width-aware bucket salt (r13 — the v08 fixed-key-cap lesson
  * generalized to the 256-bucket hyperplane family):
  *
  *  - derivation: 1 at the bench/gate config (32 partitions — the plan
  *    the driver hashes), grows with the session's width knob, capped;
  *  - invariance: a forced salt > 1 yields the EXACT same pair set as
  *    the unsalted join (every same-bucket pair meets exactly once:
  *    b keeps one hash slot, a replicates over all slots).
  */
class BlockSaltSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketSalt: 1 at the gate config, scales with partitions, capped at 64") {
    assert(Similarity.bucketSalt(256, 32) === 1)
    assert(Similarity.bucketSalt(256, 256) === 4)
    assert(Similarity.bucketSalt(256, 2000) === 32)
    assert(Similarity.bucketSalt(16, 2000) === 64)
    assert(Similarity.bucketSalt(4096, 32) === 1)
    assert(Similarity.bucketSalt(256, spark) === 1) // session conf = 32
  }

  test("forced salt leaves the v06 bucket-pair relation identical") {
    val e = Similarity.emb(spark, dir).withColumn("bucket", lshBucket(col("v")))
    val a0 = e.select(col("bucket"), col("vec_id").as("a_id"),
      col("v").as("va"), col("nrm").as("na"))
    val b0 = e.select(col("bucket"), col("vec_id").as("b_id"),
      col("v").as("vb"), col("nrm").as("nb"))
    def pairs(salt: Int) = {
      val (a, b, keys) = Similarity.saltSides(a0, b0, col("b_id"), Seq("bucket"), salt)
      a.join(b, keys).filter(col("a_id") < col("b_id"))
        .select(col("bucket"), col("a_id"), col("b_id"))
    }
    val plain = pairs(1)
    val salted = pairs(4)
    assert(salted.count() === plain.count(), "salted join changed the pair count")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join changed the pair set")
  }

  test("forced salt leaves the c02 train-eval relation identical (b side replicated)") {
    val e = Similarity.emb(spark, dir).withColumn("bucket", lshBucket(col("v")))
    val ev = e.filter(col("vec_id") % 50 === 0)
      .select(col("bucket"), col("vec_id").as("eval_id"))
    val tr = e.filter(col("vec_id") % 50 =!= 0)
      .select(col("bucket"), col("vec_id").as("train_id"))
    def pairs(salt: Int) = {
      val (evS, trS, keys) = Similarity.saltSides(ev, tr, col("train_id"), Seq("bucket"), salt)
      trS.join(evS, keys).select(col("train_id"), col("eval_id"))
    }
    val plain = pairs(1)
    val salted = pairs(4)
    assert(salted.count() === plain.count(), "salted join changed the pair count")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join changed the candidate set")
  }
}
