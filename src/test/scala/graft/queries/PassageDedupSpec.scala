package graft.queries

import graft.SparkSpec

/** d09's passage-dedup core on hand corpora: keep-first at passage
  * granularity (cross-doc AND within-doc), order-preserving reassembly,
  * ragged tails, empty docs, and the global uniqueness invariant
  * (every distinct passage survives exactly once corpus-wide).
  */
class PassageDedupSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String)], w: Int = 2): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    Dedup.passageDedup(docs.toDF("doc_id", "text"), w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("cross-doc duplicate passage is kept only in the smallest doc_id") {
    val out = run(Seq(1L -> "a b c d", 2L -> "a b x y"))
    assert(out(1L) == ((2L, 0L, "a b c d")))
    assert(out(2L) == ((1L, 1L, "x y")))
  }

  test("within-doc repeat keeps only the first occurrence") {
    val out = run(Seq(1L -> "a b a b"))
    assert(out(1L) == ((1L, 1L, "a b")))
  }

  test("ragged tail chunks and order-preserving reassembly") {
    val out = run(Seq(1L -> "a b c"))
    // chunks [a b][c] — both unique, doc round-trips
    assert(out(1L) == ((2L, 0L, "a b c")))
  }

  test("empty and whitespace-only docs emit empty text_clean, not null") {
    val out = run(Seq(1L -> "", 2L -> "   ", 3L -> "a b"))
    assert(out(1L) == ((0L, 0L, "")))
    assert(out(2L) == ((0L, 0L, "")))
    assert(out(3L) == ((1L, 0L, "a b")))
  }

  test("passages compare lowercased (Text.tokens semantics)") {
    val out = run(Seq(1L -> "A B", 2L -> "a b"))
    assert(out(1L) == ((1L, 0L, "a b")))
    assert(out(2L) == ((0L, 1L, "")))
  }

  test("global invariant: each distinct passage survives exactly once") {
    val docs = Seq(1L -> "a b c d", 2L -> "c d e f", 3L -> "a b e f")
    val out = run(docs)
    // distinct passages: {a b, c d, e f} — 3 kept, 3 removed, all in
    // the earliest holder
    assert(out.values.map(_._1).sum == 3L)
    assert(out.values.map(_._2).sum == 3L)
    assert(out(1L)._3 == "a b c d")
    assert(out(2L)._3 == "e f")
    assert(out(3L)._3 == "")
  }

  test("passages kernel matches a reference grouping on random texts") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val n = rnd.nextInt(30)
      val text = Seq.fill(n)("w" + rnd.nextInt(8)).mkString(" ") +
        (if (rnd.nextBoolean()) "  " else "") // stray whitespace
      val w = 1 + rnd.nextInt(4)
      val expected = text.toLowerCase.split(" ").filter(_.nonEmpty)
        .grouped(w).map(_.mkString(" ")).toSeq
      assert(graft.functions.Text.passagesStr(text, w).toSeq == expected,
        s"text='$text' w=$w")
    }
  }

  test("random corpora: pipeline equals the in-memory reference") {
    // small vocabulary forces heavy cross-doc passage collisions
    val rnd = new scala.util.Random(1234)
    (0 until 3).foreach { round =>
      val w = 2 + round // w in {2, 3, 4}
      val docs = (0L until 40L).map(i =>
        i -> Seq.fill(1 + rnd.nextInt(12))("t" + rnd.nextInt(6)).mkString(" "))
      // reference: global first occurrence by (doc_id, pos), then rebuild
      val chunked = docs.map { case (id, text) =>
        id -> text.toLowerCase.split(" ").filter(_.nonEmpty)
          .grouped(w).map(_.mkString(" ")).toVector
      }
      val owner = scala.collection.mutable.Map.empty[String, (Long, Int)]
      for ((id, cs) <- chunked; (c, pos) <- cs.zipWithIndex)
        if (!owner.contains(c) || Ordering[(Long, Int)].lt((id, pos), owner(c)))
          owner(c) = (id, pos)
      val expected = chunked.map { case (id, cs) =>
        val kept = cs.zipWithIndex.filter { case (c, pos) => owner(c) == ((id, pos)) }
        id -> ((kept.size.toLong, (cs.size - kept.size).toLong, kept.map(_._1).mkString(" ")))
      }.toMap
      assert(run(docs, w) == expected, s"w=$w")
    }
  }

  test("fixture smoke at sf0.001: totals add up and dedup bites") {
    val out = graft.SparkEntry.queries("d09_passage_dedup")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    val removed = out.map(_.getLong(2)).sum
    assert(removed > 0, "expected at least one cross-doc duplicate passage in the fixture")
  }
}
