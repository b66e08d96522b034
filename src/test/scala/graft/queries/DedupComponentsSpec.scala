package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Connected-components algorithms on adversarial graph shapes — in
  * particular the large/small-star logarithmic round bound that is the
  * point of d07 (min-label propagation needs DIAMETER rounds).
  */
class DedupComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def pairsOf(edges: Seq[(Long, Long)]) =
    edges.toDF("a_id", "b_id")

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star components: chain graph converges in ~log2(n) rounds, labels = component min") {
    // a 64-node chain has diameter 63: min-label propagation would need
    // 63 rounds; large/small-star must stay logarithmic
    val n = 64L
    val chain = (1L until n).map(i => (i, i + 1))
    val (lbls, rounds) = Dedup.starComponentsWithRounds(pairsOf(chain))
    val m = labelsOf(lbls)
    assert(m.size === n.toInt)
    assert(m.values.toSet === Set(1L), "every chain node labels to the minimum")
    assert(rounds <= 8, s"expected O(log n) rounds on a 64-chain, got $rounds")
  }

  test("star components: mixed shapes (two chains + star + isolated edge + singleton-free)") {
    val edges = Seq[(Long, Long)](
      (10, 11), (11, 12), (12, 13),       // chain -> min 10
      (20, 21), (20, 22), (20, 23),       // star rooted at min already
      (31, 30),                           // isolated edge, reversed input order
      (41, 42), (42, 40))                 // chain with min in the middle
    val got = labelsOf(Dedup.starComponents(pairsOf(edges)))
    val want = Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
      30L -> 30L, 31L -> 30L,
      40L -> 40L, 41L -> 40L, 42L -> 40L)
    assert(got === want)
  }

  test("min-label THROWS past its diameter cap instead of returning wrong labels; star handles the same graph") {
    // a 30-node chain has diameter 29 > the 20-round min-label cap: the
    // guard must refuse to return unconverged (wrong) labels...
    val chain = (1L until 30L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      Dedup.minLabelComponents(pairsOf(chain)).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // ...while the logarithmic-round variant solves it comfortably
    val m = labelsOf(Dedup.starComponents(pairsOf(chain)))
    assert(m.values.toSet === Set(1L))
  }

  test("star components agree with min-label propagation on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val pairs = pairsOf(edges)
    val star = labelsOf(Dedup.starComponents(pairs))
    val prop = labelsOf(
      Dedup.minLabelComponents(pairs).select(col("id"), col("lbl")))
    assert(star === prop)
  }
}
