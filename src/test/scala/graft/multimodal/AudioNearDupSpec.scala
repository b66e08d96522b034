package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** m04 (r19): the audio twin of MediaNearDupSpec — the window-mean
  * fingerprint must recover the painted 64-window pattern THROUGH the
  * real WAV encode→decode round trip, and the shared banded hamming
  * join must stay pigeonhole-exact on the audio fingerprints.
  */
class AudioNearDupSpec extends SparkSpec {

  import spark.implicits._

  test("audioHash recovers the painted windows through encode -> decode") {
    for (pattern <- Seq(0L, 1L, 0x8000000000000000L, 0x5a5a17c3deadbeefL)) {
      val w = 40 // one fixture width; ragged bounds hit via the fixture test
      val samples = new Array[Int](64 * w)
      for (j <- 0 until 64; i <- j * w until (j + 1) * w)
        samples(i) = if (((pattern >> j) & 1L) == 1L) 12000 else 3000
      val got = Multimodal.audioHash(MediaCodec.decodeWav(
        MediaCodec.encodeWav(samples, 16000)))
      // all-set and all-clear degenerate to hash 0 (mean == every window)
      val want = if (pattern == -1L || pattern == 0L) 0L else pattern
      assert(got === want, s"pattern ${pattern.toHexString}")
    }
  }

  test("attachAudioNearDup payloads hash to the closed-form painted " +
      "pattern (the oracle's arithmetic)") {
    val docs = (0L until 60L).map(i => (i, s"doc $i", 10L))
      .toDF("doc_id", "text", "n_chars")
    val hashes = Multimodal.audioHashes(
      Multimodal.attachAudioNearDup(docs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.keySet === (0L until 60L).filter(_ % 3 == 1).toSet)
    for ((id, ph) <- hashes) {
      val painted = (0 until 64).map(j => Multimodal.audioPaintedBit(id, j))
      val n1 = painted.sum
      val want = (0 until 64).foldLeft(0L) { (acc, j) =>
        if (painted(j) == 1 && n1 < 64) acc | (1L << j) else acc
      }
      assert(ph === want, s"doc $id")
    }
  }

  test("within a group, hamming == |delta member|; the banded join " +
      "equals brute force on audio fingerprints") {
    val docs = (0L until 120L).map(i => (i, s"doc $i", 10L))
      .toDF("doc_id", "text", "n_chars")
    val sigs = Multimodal.audioHashes(
      Multimodal.attachAudioNearDup(docs)).localCheckpoint()
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
    for ((a, b, hm) <- banded if a / 24 == b / 24)
      assert(hm === math.abs((a % 24) / 3 - (b % 24) / 3).toInt,
        s"pair ($a, $b)")
    val want = for {
      a <- 0L until 120L if a % 3 == 1
      b <- a + 1 until 120L if b % 3 == 1 && a / 24 == b / 24 &&
        math.abs((a % 24) / 3 - (b % 24) / 3) <= 3
    } yield (a, b)
    assert(want.forall(p => banded.exists(t => (t._1, t._2) == p)),
      "a planted sibling pair is missing")
  }
}
