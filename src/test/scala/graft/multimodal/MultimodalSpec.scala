package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (0L, "an image document", 17L),
    (1L, "an audio document", 17L),
    (2L, "a video document", 16L),
    (5L, "another video doc", 17L))
    .toDF("doc_id", "text", "n_chars")

  test("attachMedia builds real encoded payloads with typed metadata") {
    val m = Multimodal.attachMedia(docs).collect().sortBy(_.doc_id)
    assert(m.map(_.meta.mediaType).toSeq === Seq("image", "audio", "video", "video"))
    assert(m(1).meta.sampleRateHz === 16000)
    assert(m(2).meta.durationMs === 160L)
    // image payload is a genuine BMP whose header agrees with the catalog
    val img = MediaCodec.decode(m(0).content)
    assert(img.kind === "bmp")
    assert(img.width === m(0).meta.width && img.height === m(0).meta.height)
    // audio payload is a genuine WAV at the catalog sample rate
    val aud = MediaCodec.decode(m(1).content)
    assert(aud.kind === "wav" && aud.sampleRateHz === 16000)
    assert(aud.values.length === 256 + 1) // valueCount for doc_id 1
  }

  test("decoded values match the closed-form generators the oracle uses") {
    val m = Multimodal.attachMedia(docs).collect().sortBy(_.doc_id)
    val img = MediaCodec.decode(m(0).content)
    assert(img.values.toSeq ===
      (0 until img.values.length).map(i => Multimodal.pixelValue(0L, i.toLong)))
    val vid = MediaCodec.decode(m(2).content)
    assert(vid.values.length === 1024)
    assert(vid.values.toSeq ===
      (0 until 1024).map(i => Multimodal.sampleValue(2L, i.toLong)))
  }

  test("extractFeatures is deterministic, fixed-dim, shuffle-free") {
    val media = Multimodal.attachMedia(docs)
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.doc_id)
    assert(f1.length === 4)
    assert(f1.forall(_.features.length === 8))
    assert(f1.map(_.features.toSeq) === f2.map(_.features.toSeq)) // real decode is deterministic
    // mean-pool of segment 0 equals the hand-computed mean
    val aud = MediaCodec.decode(Multimodal.attachMedia(docs).collect()
      .find(_.doc_id == 1L).get.content).values
    val seg = aud.slice(0, aud.length / 8)
    assert(f1.find(_.doc_id == 1L).get.features(0) ===
      (seg.map(_.toLong).sum.toDouble / seg.length).toFloat)
    // narrow plan: no Exchange node
    val plan = Multimodal.extractFeatures(media, 8).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("sampleFrames explodes video rows into k frames, others pass through") {
    val media = Multimodal.attachMedia(docs)
    val frames = Multimodal.sampleFrames(media, k = 3, dim = 4).collect()
    val byDoc = frames.groupBy(_.doc_id).view.mapValues(_.length).toMap
    assert(byDoc === Map(0L -> 1, 1L -> 1, 2L -> 3, 5L -> 3))
    // distinct frames of one video decode to distinct features
    val v = frames.filter(_.doc_id === 2L).sortBy(_.frame_index)
    assert(v.map(_.features.toSeq).distinct.length === 3)
  }

  test("resizeMeta caps the longer side, payload untouched") {
    val media = Multimodal.attachMedia(docs)
    val original = media.collect().sortBy(_.doc_id)
    val resized = Multimodal.resizeMeta(media, maxSide = 32).collect().sortBy(_.doc_id)
    assert(resized.forall(r => math.max(r.meta.width, r.meta.height) <= 32))
    assert(resized.zip(original).forall { case (r, o) =>
      java.util.Arrays.equals(r.content, o.content)
    })
  }

  test("m02 metadata rows multiply exactly like the decode path's sampleFrames") {
    // the oracle-gated metadata table and the decode-path feature table
    // must agree on (doc_id, frame_index) multiplicity — both derive it
    // from the shared frameIndices
    val dir = "/root/testdata/sf0.001"
    val metaRows = Multimodal.metaTable(spark, dir, maxSide = 96, k = 4)
      .select("doc_id", "frame_index").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val media = Multimodal.attachMedia(graft.Tables(spark, dir, "documents"))
    val featRows = Multimodal.sampleFrames(media, k = 4, dim = 4).collect()
      .map(f => (f.doc_id, f.frame_index)).toSet
    assert(metaRows === featRows)
    assert(metaRows.nonEmpty)
  }

  test("m02 columnar meta equals the case-class attach→resize path row for row") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val columnar = Multimodal.metaTable(spark, dir, maxSide = 96, k = 4)
      .collect().map(_.toSeq).toSeq
    val viaPayload = Multimodal
      .resizeMeta(Multimodal.attachMedia(graft.Tables(spark, dir, "documents")), 96)
      .flatMap { r =>
        Multimodal.frameIndices(r.meta, 4).map(f =>
          (r.doc_id, r.meta.mediaType, r.meta.width, r.meta.height,
            r.meta.sampleRateHz, r.meta.durationMs, f))
      }.collect().sortBy(t => (t._1, t._7))
      .map(t => Seq(t._1, t._2, t._3, t._4, t._5, t._6, t._7)).toSeq
    assert(columnar === viaPayload)
    assert(columnar.nonEmpty)
  }

  test("m01 featureSummary aggregates the decoded values exactly") {
    val dir = "/root/testdata/sf0.001"
    val got = Multimodal.featureSummary(spark, dir).collect()
    assert(got.nonEmpty)
    // brute-force expectation straight from the generators, no codec
    got.take(30).foreach { r =>
      val id = r.getLong(0)
      val mt = r.getString(1)
      val w = 64 + (id % 8).toInt * 16
      val n = Multimodal.valueCount(id, mt, w, 64)
      val vals =
        if (mt == "image") (0 until n).map(i => Multimodal.pixelValue(id, i.toLong))
        else (0 until n).map(i => Multimodal.sampleValue(id, i.toLong))
      assert(r.getInt(2) === n, s"n_values for doc $id")
      assert(r.getLong(3) === vals.map(_.toLong).sum, s"value_sum for doc $id")
      assert(r.getInt(4) === vals.min, s"value_min for doc $id")
      assert(r.getInt(5) === vals.max, s"value_max for doc $id")
    }
  }
}
