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

  test("attachMedia builds typed binary rows with metadata") {
    val m = Multimodal.attachMedia(docs).collect().sortBy(_.doc_id)
    assert(m.map(_.meta.mediaType).toSeq === Seq("image", "audio", "video", "video"))
    assert(new String(m(0).content, "UTF-8") === "an image document")
    assert(m(1).meta.sampleRateHz === 16000)
    assert(m(2).meta.durationMs === 160L)
  }

  test("extractFeatures is deterministic, fixed-dim, shuffle-free") {
    val media = Multimodal.attachMedia(docs)
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.doc_id)
    assert(f1.length === 4)
    assert(f1.forall(_.features.length === 8))
    assert(f1.map(_.features.toSeq) === f2.map(_.features.toSeq)) // deterministic stub
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
    val resized = Multimodal.resizeMeta(media, maxSide = 32).collect().sortBy(_.doc_id)
    assert(resized.forall(r => math.max(r.meta.width, r.meta.height) <= 32))
    assert(new String(resized(0).content, "UTF-8") === "an image document")
  }

  test("m02 metadata rows multiply exactly like the decode path's sampleFrames") {
    // the oracle-gated metadata table and the stub-decode feature table
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
}
