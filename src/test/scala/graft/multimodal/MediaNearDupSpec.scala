package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** m03 (r19, verdict ask #3): the perceptual average-hash must recover
  * the painted 64-bit pattern THROUGH the real BMP encode→decode round
  * trip, and the banded hamming join must be pigeonhole-exact (equal
  * to brute-force all-pairs) — d05's guarantees, re-proven on the
  * 64-bit media fingerprint.
  */
class MediaNearDupSpec extends SparkSpec {

  import spark.implicits._

  test("avgHash recovers the painted bits through encode -> decode") {
    // hand-built images: paint an arbitrary pattern, encode as a real
    // BMP (bottom-up BGR rows, stride padding), decode, hash
    for (pattern <- Seq(0L, 1L, 0x8000000000000000L, 0x5a5a17c3deadbeefL)) {
      val (w, h) = (80, 64) // a fixture shape: uniform 10x8 cells
      val px = new Array[Int](w * h * 3)
      for (j <- 0 until 64; y <- (j / 8) * 8 until (j / 8 + 1) * 8;
           x <- (j % 8) * 10 until (j % 8 + 1) * 10; c <- 0 until 3)
        px((y * w + x) * 3 + c) = if (((pattern >> j) & 1L) == 1L) 200 else 50
      val got = Multimodal.avgHash(MediaCodec.decodeBmp(
        MediaCodec.encodeBmp(px, w, h)))
      // all-set and all-clear degenerate to hash 0 (mean == every cell)
      val want = if (pattern == -1L || pattern == 0L) 0L else pattern
      assert(got === want, s"pattern ${pattern.toHexString}")
    }
  }

  test("attachMediaNearDup payloads hash to the closed-form painted " +
      "pattern (the oracle's arithmetic)") {
    val docs = (0L until 60L).map(i => (i, s"doc $i", 10L))
      .toDF("doc_id", "text", "n_chars")
    val hashes = Multimodal.perceptualHashes(
      Multimodal.attachMediaNearDup(docs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.keySet === (0L until 60L).filter(_ % 3 == 0).toSet)
    for ((id, ph) <- hashes) {
      val painted = (0 until 64).map(j => Multimodal.paintedBit(id, j))
      val n1 = painted.sum
      val want = (0 until 64).foldLeft(0L) { (acc, j) =>
        if (painted(j) == 1 && n1 < 64) acc | (1L << j) else acc
      }
      assert(ph === want, s"doc $id")
    }
  }

  test("within a group, hamming == |delta member| (prefix flips); the " +
      "banded join equals brute force") {
    val docs = (0L until 120L).map(i => (i, s"doc $i", 10L))
      .toDF("doc_id", "text", "n_chars")
    val sigs = Multimodal.perceptualHashes(
      Multimodal.attachMediaNearDup(docs)).localCheckpoint()
    val banded = Multimodal.mediaNearDupPairs(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.ph").bitwiseXOR(col("b.ph"))).cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(_._3 <= 3).toSet
    assert(banded === brute, "pigeonhole banding lost or invented a pair")
    assert(banded.nonEmpty, "the planted groups must yield sibling pairs")
    // same-group pairs: hamming is exactly the member distance
    for ((a, b, hm) <- banded if a / 24 == b / 24)
      assert(hm === math.abs((a % 24) / 3 - (b % 24) / 3).toInt,
        s"pair ($a, $b)")
    // every same-group pair with member distance <= 3 is present
    val want = for {
      a <- 0L until 120L if a % 3 == 0
      b <- a + 1 until 120L if b % 3 == 0 && a / 24 == b / 24 &&
        math.abs((a % 24) / 3 - (b % 24) / 3) <= 3
    } yield (a, b)
    assert(want.forall(p => banded.exists(t => (t._1, t._2) == p)),
      "a planted sibling pair is missing")
    // the banded join is an equi-join on (band index, band value) —
    // never an all-pairs product (d05's pinned property, re-asserted
    // mechanically on the 64-bit media variant)
    val plan = Multimodal.mediaNearDupPairs(sigs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"banded hamming must never plan a cartesian product:\n$plan")
  }
}
