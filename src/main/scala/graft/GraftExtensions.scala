package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharFp, DistinctShingles, DotProduct, FpsExpr, HashedClassifier, LangHits, LongDot, LshBucket, MinHashSig, Passages, ProbesExpr, QualityScore, QuantizeUnitI8, SegmentsExpr, SimHash32, TermCounts, TokenStats, WindowFps}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so
  * `spark.conf spark.sql.extensions=graft.GraftExtensions` makes
  * `SELECT graft_dot(a, b)` available to pure-SQL users alongside the
  * Column API (`graft.functions.Vectors.dot`).
  *
  * No custom optimizer Rule or SparkStrategy is injected — SURVEY.md §4
  * establishes none is required for this engine's semantics; the hook
  * exists here so adding one later is a one-liner.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(arrayA, arrayB) takes two arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_minhash(fps) takes one argument")
        MinHashSig(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[DistinctShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_shingles(text) takes one argument")
        DistinctShingles(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_classifier"),
      new ExpressionInfo(classOf[HashedClassifier].getName, "graft_classifier"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_classifier(text) takes one argument")
        HashedClassifier(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_passages"),
      new ExpressionInfo(classOf[Passages].getName, "graft_passages"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_passages(text) takes one argument")
        Passages(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_window_fps"),
      new ExpressionInfo(classOf[WindowFps].getName, "graft_window_fps"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_window_fps(text) takes one argument (w/stride fixed at 40/20)")
        WindowFps(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_fps"),
      new ExpressionInfo(classOf[FpsExpr].getName, "graft_fps"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_fps(shingles) takes one argument")
        FpsExpr(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_simhash(fps) takes one argument")
        SimHash32(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_tokenstats"),
      new ExpressionInfo(classOf[TokenStats].getName, "graft_tokenstats"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_tokenstats(text) takes one argument")
        TokenStats(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_quality"),
      new ExpressionInfo(classOf[QualityScore].getName, "graft_quality"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_quality(text) takes one argument")
        QualityScore(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lshbucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "graft_lshbucket"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_lshbucket(vec) takes one argument")
        LshBucket(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_charfp"),
      new ExpressionInfo(classOf[CharFp].getName, "graft_charfp"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_charfp(text) takes one argument")
        CharFp(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_segments"),
      new ExpressionInfo(classOf[SegmentsExpr].getName, "graft_segments"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_segments(key) takes one argument")
        SegmentsExpr(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_langhits"),
      new ExpressionInfo(classOf[LangHits].getName, "graft_langhits"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_langhits(text) takes one argument")
        LangHits(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_termcounts"),
      new ExpressionInfo(classOf[TermCounts].getName, "graft_termcounts"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_termcounts(text) takes one argument")
        TermCounts(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_quantize_i8"),
      new ExpressionInfo(classOf[QuantizeUnitI8].getName, "graft_quantize_i8"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_quantize_i8(vec, nrm) takes two arguments")
        QuantizeUnitI8(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_long_dot"),
      new ExpressionInfo(classOf[LongDot].getName, "graft_long_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_long_dot(codesA, codesB) takes two arguments")
        LongDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_probes"),
      new ExpressionInfo(classOf[ProbesExpr].getName, "graft_probes"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_probes(key) takes one argument")
        ProbesExpr(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cms_weighted"),
      new ExpressionInfo(classOf[graft.functions.CmsWeightedAgg].getName, "graft_cms_weighted"),
      (children: Seq[Expression]) => {
        // graft_cms_weighted(item, cnt[, eps, confidence, seed]) — the
        // aggregate itself; the analyzer wraps it in AggregateExpression
        // like any builtin agg. eps/confidence/seed must be literals.
        require(children.length == 2 || children.length == 5,
          "graft_cms_weighted(item, cnt[, eps, confidence, seed])")
        def num(i: Int, what: String): Double = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) =>
            v.doubleValue()
          case org.apache.spark.sql.catalyst.expressions.Literal(
            v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"graft_cms_weighted: $what must be a numeric literal, got $other")
        }
        if (children.length == 2)
          graft.functions.CmsWeightedAgg(children.head, children(1), 0.001, 0.99, 42)
        else
          graft.functions.CmsWeightedAgg(children.head, children(1),
            num(2, "eps"), num(3, "confidence"), num(4, "seed").toInt)
      }))
  }
}
