package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Text, Vectors}

/** Round-10 curation/retrieval additions: c06 adaptive quality
  * thresholds, p07 temperature-scaled mixture quotas, and v09's
  * quantized-candidate recall (the driver's hash gate pins exact
  * values; these pin the SEMANTIC contracts a regenerated oracle
  * could silently drift from).
  */
class AdaptiveMixSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("c06: per-source threshold is that source's own q-p25 and the kept count mirrors it") {
    val got = Curation.queries("c06_adaptive_quality")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    // independent recompute: per-source q vector → lerp p25 → count
    val qBySource = graft.Tables(spark, dir, "documents")
      .select(col("source"), Text.qualityScore(col("text")).as("q"),
        Text.tokenStats(col("text")).getField("_1").cast("long").as("t"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1)
    for ((src, rows) <- qBySource) {
      val qs = rows.map(_._2).sorted
      val pos = 0.25 * (qs.length - 1)
      val lo = qs(pos.toInt)
      val thr =
        if (pos == pos.toInt) lo
        else lo + (qs(math.ceil(pos).toInt) - lo) * (pos - pos.toInt)
      val kept = rows.filter(_._2 >= thr)
      val (nDocs, nKept, tokKept, thrMicros) = got(src)
      assert(nDocs === rows.length.toLong)
      assert(nKept === kept.length.toLong, s"$src: kept mismatch")
      assert(tokKept === kept.map(_._3).sum, s"$src: token mismatch")
      assert(thrMicros === math.floor(thr * 1e6).toLong, s"$src: thr mismatch")
      // an adaptive p25 keeps roughly the top three quarters
      assert(nKept >= (0.7 * nDocs).toLong && nKept <= nDocs)
    }
  }

  test("p07: quota = ceil(3·√n) and the hash rank always fills it") {
    val rows = Curation.queries("p07_temperature_mix")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, quota, kept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(quota === math.ceil(3.0 * math.sqrt(n.toDouble)).toLong)
      assert(kept === math.min(n, quota),
        s"${r.getString(0)}: rank membership must fill min(n, quota)")
    }
  }

  test("p07 up-weights scarce sources: kept fraction decreases with source size") {
    // ceil(3·√n)/n is strictly decreasing in n — the τ=1/2 temperature
    // contract: a 4× larger source keeps only ~2× the docs
    import spark.implicits._
    val big = (1 to 64).map(i => (i.toLong, "big", s"doc text number $i"))
    val small = (65 to 69).map(i => (i.toLong, "small", s"doc text number $i"))
    val df = (big ++ small).toDF("doc_id", "source", "text")
    val dirTmp = java.nio.file.Files.createTempDirectory("p07mix").toString
    df.write.mode("overwrite").parquet(s"$dirTmp/documents.parquet")
    val out = Curation.queries("p07_temperature_mix")(spark, dirTmp)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val fracBig = out("big")._2.toDouble / out("big")._1
    val fracSmall = out("small")._2.toDouble / out("small")._1
    assert(fracSmall > fracBig,
      s"temperature must favor the scarce source: $fracSmall !> $fracBig")
  }

  test("p07 pre-trim form: exact equivalence on fixtures and under heavy source skew") {
    import spark.implicits._
    // fixture corpus: the pre-trim must reproduce the declared query
    val docsFx = graft.Tables(spark, dir, "documents")
    val declared = Curation.queries("p07_temperature_mix")(spark, dir).collect().toSeq
    val pretrim = Curation.temperatureMixPretrim(docsFx).collect().toSeq
    assert(pretrim === declared)

    // one 20k-row hot source next to a 7-row scarce one: the covered
    // source must rank only its sliver (~slack·quota rows), the tiny
    // one falls back to the full rank — outputs still identical
    val hot = (1 to 20000).map(i => (i.toLong, "hot", s"skewed doc body $i"))
    val cold = (20001 to 20007).map(i => (i.toLong, "cold", s"rare doc body $i"))
    val skew = (hot ++ cold).toDF("doc_id", "source", "text")
    val a = Curation.temperatureMixPretrim(skew).collect().toSeq
    val dirTmp = java.nio.file.Files.createTempDirectory("p07skew").toString
    skew.write.mode("overwrite").parquet(s"$dirTmp/documents.parquet")
    val b = Curation.queries("p07_temperature_mix")(spark, dirTmp).collect().toSeq
    assert(a === b, "pre-trim must be invisible in the result")
    // quota for 20k rows is ceil(3·√20000) = 425; covered ⇒ the hot
    // source's window input is the sliver, not 20k rows
    val hotRow = a.find(_.getString(0) == "hot").get
    assert(hotRow.getLong(2) === math.ceil(3.0 * math.sqrt(20000.0)).toLong)
    assert(hotRow.getLong(3) === hotRow.getLong(2), "hot source must fill its quota")
  }

  test("v09: quantized candidate phase keeps exact-cosine recall@3 high") {
    val v09 = Similarity.queries("v09_knn_int8")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    // brute-force exact top-3 on the same query range
    val e = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), Vectors.toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    val q = e.filter(col("vec_id") >= 300 && col("vec_id") < 310)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    val exact = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        (Vectors.dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cosine"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(v09.size === 30, s"expected 10 queries × top-3, got ${v09.size}")
    val hits = (v09 intersect exact).size
    // int8 on unit vectors distorts cosine by ≲1/127 per pair — far
    // tighter than the fixture's neighbor gaps; expect near-perfect
    // recall through a 20-candidate frontier
    assert(hits >= 27, s"v09 recall@3 regressed: $hits/30")
  }
}
