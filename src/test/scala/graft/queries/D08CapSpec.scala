package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The d08 segment-0 participation cap (Dedup.D08Cap — the v03
  * pattern at the PassJoin block level): provably a no-op at the gate
  * fixtures, correctly binding + audited on a hot-block corpus, and
  * physically pre-trimmed below the exchange (WindowGroupLimit).
  */
class D08CapSpec extends SparkSpec {

  import spark.implicits._

  private def keyDocs(dir: String): DataFrame =
    graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 40).as("k"))

  private def docsOf(keys: Seq[String]): DataFrame =
    keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("doc_id", "k")

  private def pairSet(df: DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def ed(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("cap is a no-op at the gate fixtures: audit empty, result identical to uncapped") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = keyDocs(s"/root/testdata/$sf")
      assert(Dedup.d08CapAudit(docs).isEmpty,
        s"$sf has a segment-0 block over D08Cap — the cap would change gate results")
      assert(pairSet(Dedup.editDistancePairs(docs)) ===
        pairSet(Dedup.editDistancePairs(docs, cap = Int.MaxValue)), sf)
    }
  }

  test("cap binds on a hot block: only the cap smallest participate, audit accounts the trim") {
    // ten docs sharing the full 13-char segment-0 (and everything but
    // the last char): a pairwise ed <= 1 clique — quadratic without
    // the cap
    val keys = (0 until 10).map(i => "aaaaaaaaaaaaa" + "b" * 26 + ('a' + i).toChar)
    val docs = docsOf(keys)

    val audit = Dedup.d08CapAudit(docs, cap = 5).collect()
    assert(audit.length === 1)
    assert(audit.head.getString(0) === "aaaaaaaaaaaaa")
    assert(audit.head.getLong(1) === 10L) // n_docs
    assert(audit.head.getLong(2) === 5L)  // n_trimmed

    val got = pairSet(Dedup.editDistancePairs(docs, cap = 5))
    // participants are doc_ids 0..4; every pair differs in exactly the
    // last char -> d = 1
    val want = (for (a <- 0 until 5; b <- (a + 1) until 5)
      yield (a.toLong, b.toLong, 1)).toSet
    assert(got === want)
  }

  test("capped pairs match a quadratic reference over the participants on a mixed corpus") {
    val rnd = new scala.util.Random(29)
    // three hot segment-0 prefixes plus unique-prefix background docs,
    // random tails -> pairs within and across blocks, some over tau
    val keys = (0 until 60).map { i =>
      val prefix =
        if (i % 4 == 3) f"uniq$i%02d-prefix0" // 13 chars, unique block
        else "hotblock" + ('A' + i % 3).toChar + "pre0" // 13 chars, 3 hot blocks
      prefix + Iterator.fill(27)(('a' + rnd.nextInt(3)).toChar).mkString
    }
    val docs = docsOf(keys)
    val cap = 7
    val participants = Dedup.d08Participants(docs, cap)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = (for {
      (aId, aK) <- participants
      (bId, bK) <- participants
      if aId < bId
      d = ed(aK, bK) if d <= 2
    } yield (aId, bId, d)).toSet
    assert(pairSet(Dedup.editDistancePairs(docs, cap)) === want)
  }

  test("the corpus never pays a full window: rank only the hot sliver, anti-join the trim") {
    val p = Dedup.d08Participants(keyDocs("/root/testdata/sf0.001"))
      .queryExecution.executedPlan.toString
    // the rank window runs only over the hot-block sliver, inside the
    // checkpointed `trimmed` relation's own job — so the participant
    // plan the corpus actually pays is a narrow scan + anti join
    // against the (tiny, materialized) trim set, with NO window and no
    // rank exchange anywhere on the corpus path
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("Window"),
      s"the corpus path must not pay a rank window — that is the sliver's job:\n$p")
  }
}
