package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.SparkSpec

/** The weighted CMS aggregate (functions/CmsWeighted.scala): folding
  * pre-counted `(item, cnt)` pairs must yield the SAME sketch the
  * builtin `count_min_sketch` builds from the expanded multiset —
  * x04's one-pass rewrite rests on this identity.
  */
class CmsWeightedSpec extends SparkSpec {

  import spark.implicits._

  test("weighted sketch over counts is byte-identical to the builtin over occurrences") {
    // multiset with heavy skew, spread over several partitions so both
    // the update AND merge paths run
    val items = (1 to 40).flatMap(i => Seq.fill(i)(s"item_$i"))
    val raw = items.toDF("item").repartition(7)
    val builtinBytes = raw
      .agg(expr("count_min_sketch(item, 0.001d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val weightedBytes = raw.groupBy("item").agg(count(lit(1)).as("c"))
      .repartition(5)
      .agg(CmsWeighted(col("item"), col("c"), 0.001, 0.99, 42))
      .head().getAs[Array[Byte]](0)
    // counter updates commute ⇒ identical tables, totalCount, and
    // serialized form — assert the strongest version
    assert(java.util.Arrays.equals(builtinBytes, weightedBytes))
    val a = CountMinSketch.readFrom(new ByteArrayInputStream(builtinBytes))
    val b = CountMinSketch.readFrom(new ByteArrayInputStream(weightedBytes))
    assert(a.totalCount() === b.totalCount() && b.totalCount() === items.length.toLong)
    (1 to 40).foreach(i =>
      assert(a.estimateCount(s"item_$i") === b.estimateCount(s"item_$i")))
    assert(a.estimateCount("never seen") === b.estimateCount("never seen"))
  }

  test("null items and zero counts are no-ops; negative counts raise") {
    val df = Seq((Some("a"), 3L), (None, 5L), (Some("b"), 0L)).toDF("item", "c")
    val bytes = df.agg(CmsWeighted(col("item"), col("c"), 0.01, 0.99, 7))
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    assert(cms.totalCount() === 3L)
    assert(cms.estimateCount("b") === 0L)
    intercept[Exception] {
      Seq(("a", -1L)).toDF("item", "c")
        .agg(CmsWeighted(col("item"), col("c"), 0.01, 0.99, 7)).head()
    }
  }
}
