package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

import graft.SparkSpec

/** The driver-built-sketch codegen probes (functions/SketchProbes.scala,
  * r12): must agree row-for-row with a direct driver-side evaluation of
  * the same sketch object, stay inside whole-stage codegen (the whole
  * point of replacing the Scala UDFs), and be null-safe.
  */
class SketchProbesSpec extends SparkSpec {

  import spark.implicits._

  test("BloomHits == driver-side count over the same filter; codegen; null-safe") {
    val bf = BloomFilter.create(1000, 0.03)
    (0L until 500L).filter(_ % 3 == 0).foreach(bf.putLong)
    val rnd = new scala.util.Random(7)
    val rows: Seq[Option[Seq[Long]]] =
      Seq.fill(200)(Some(Seq.fill(rnd.nextInt(20))(rnd.nextLong() % 600))) ++
        Seq(Some(Seq.empty[Long]), None)
    // repartition: a pure-local relation gets ConvertToLocalRelation'd
    // and the plan assertion below would see only a LocalTableScan
    val df = rows.map(Tuple1(_)).toDF("fps").repartition(2)
      .select(col("fps"), SketchProbes.bloomHits(col("fps"), bf).as("hits"))
    var seen = 0
    df.collect().foreach { r =>
      val fps = if (r.isNullAt(0)) None else Some(r.getSeq[Long](0))
      val hits = if (r.isNullAt(1)) None else Some(r.getLong(1))
      assert(hits === fps.map(_.count(bf.mightContainLong).toLong), s"fps=$fps")
      seen += 1
    }
    assert(seen === rows.size)
    // stays inside whole-stage codegen, no ScalaUDF anywhere
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_bloom_hits")), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // a null ELEMENT must raise, not undercount
    intercept[Exception] {
      Seq(Tuple1(Seq[java.lang.Long](1L, null))).toDF("fps")
        .select(SketchProbes.bloomHits(col("fps"), bf)).collect()
    }
  }

  test("CmsEstimate == cms.estimateCount; codegen; null-safe") {
    val cms = CountMinSketch.create(0.001, 0.99, 42)
    val rnd = new scala.util.Random(11)
    val corpus = Seq.fill(5000)(s"w${rnd.nextInt(100)}")
    corpus.foreach(cms.add)
    val items: Seq[Option[String]] =
      (0 until 120).map(i => Some(s"w$i")) :+ Some("absent") :+ None
    val df = items.map(Tuple1(_)).toDF("item").repartition(2)
      .select(col("item"), SketchProbes.cmsEstimate(col("item"), cms).as("est"))
    df.collect().foreach { r =>
      val item = Option(r.getString(0))
      val est = if (r.isNullAt(1)) None else Some(r.getLong(1))
      assert(est === item.map(cms.estimateCount), s"item=$item")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_cms_estimate")), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }
}
