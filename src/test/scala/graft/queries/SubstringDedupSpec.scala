package graft.queries

import graft.SparkSpec
import graft.functions.Text

/** d10's substring-level dedup (overlapping-window form) on hand
  * corpora: window construction (stride, tail, short docs), the
  * keep-first-on-fingerprint rule cross-doc and within-doc, the
  * survival arithmetic, the boundary-straddling case d09's fixed
  * passages miss, and the kernel's fp-of-joined-string contract.
  * Small w/stride here — the gated query's 40/20 is the same code.
  */
class SubstringDedupSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String)], w: Int, s: Int): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    Dedup.substringDedup(docs.toDF("doc_id", "text"), w, s)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("window positions: stride, uncovered tail, short and empty docs") {
    // n=7, w=4, s=2 → full windows at 0, 2 (pos ≤ 3), tail at 3
    assert(Text.windowFpsArr("a b c d e f g", 4, 2).toSeq ===
      Seq("a b c d", "c d e f", "d e f g").map(Text.charFpStr))
    // n=6: tail lands on the stride — no extra window
    assert(Text.windowFpsArr("a b c d e f", 4, 2).toSeq ===
      Seq("a b c d", "c d e f").map(Text.charFpStr))
    // short doc: one whole-doc window; empty/whitespace: none
    assert(Text.windowFpsArr("a b", 4, 2).toSeq === Seq(Text.charFpStr("a b")))
    assert(Text.windowFpsArr("", 4, 2).isEmpty)
    assert(Text.windowFpsArr("   ", 4, 2).isEmpty)
    // lowercasing + empty-token drops (Text.tokens semantics)
    assert(Text.windowFpsArr("A  B", 4, 2).toSeq === Seq(Text.charFpStr("a b")))
  }

  test("cross-doc duplicate span survives only at the smallest (doc_id, pos)") {
    // doc 2 repeats doc 1's window "c d" at an aligned position
    val out = run(Seq(1L -> "a b c d", 2L -> "x y c d"), w = 2, s = 2)
    assert(out(1L) === ((2L, 2L, 1000000L)))
    assert(out(2L) === ((2L, 1L, 500000L)))
  }

  test("within-doc repeat keeps the first occurrence; ppm floors") {
    // windows: [a b][a b][a b c] (tail at pos 2? n=5,w=2,s=2: full at
    // 0, 2 → [a b][a b]; tail pos 3 → [b c]) — recompute: tokens
    // a b a b c: pos0=[a b] pos2=[a b] tail pos3=[b c]
    val out = run(Seq(1L -> "a b a b c"), w = 2, s = 2)
    assert(out(1L) === ((3L, 2L, 666666L)))
  }

  test("windowless docs report full survival (nothing removed)") {
    val out = run(Seq(1L -> "", 2L -> "a b"), w = 2, s = 1)
    assert(out(1L) === ((0L, 0L, 1000000L)))
    assert(out(2L) === ((1L, 1L, 1000000L)))
  }

  test("a span straddling d09's passage boundary is caught at window granularity") {
    // d09 with w=4 chunks doc1 as [a b c d][e f g h]; doc2 carries the
    // straddling span "c d e f" — no d09 passage collides, but the
    // stride-1 window join sees it
    val doc1 = "a b c d e f g h"
    val doc2 = "q r c d e f s t"
    val d9 = Dedup.passageDedup(
      { import spark.implicits._; Seq(1L -> doc1, 2L -> doc2).toDF("doc_id", "text") }, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(d9(2L) === 0L, "d09 should NOT flag the straddling span")
    val out = run(Seq(1L -> doc1, 2L -> doc2), w = 4, s = 1)
    assert(out(2L)._2 < out(2L)._1, "d10 must drop doc 2's straddling window")
  }

  test("gated defaults run codegen end to end; fps equal fp of the window strings") {
    import spark.implicits._
    val docs = Seq(1L -> Seq.tabulate(90)(i => s"t$i").mkString(" ")).toDF("doc_id", "text")
    val df = Dedup.substringDedup(docs, 40, 20)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_window_fps"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // n=90: full at 0, 20, 40 (≤ 50), tail at 50
    val toks = Seq.tabulate(90)(i => s"t$i")
    val expect = Seq(0, 20, 40, 50).map(p =>
      Text.charFpStr(toks.slice(p, p + 40).mkString(" ")))
    assert(Text.windowFpsArr(toks.mkString(" "), 40, 20).toSeq === expect)
    assert(df.collect().map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((4L, 4L)))
  }
}
