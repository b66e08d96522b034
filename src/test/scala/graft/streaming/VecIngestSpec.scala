package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.PqIndex

/** One embedding event on the ingest stream. */
case class VecEvent(vec_id: Long, label: Int, embedding: Seq[Float])

/** Streaming IVFADC maintenance (r15): vectors streamed through
  * [[VecIngest]] must land in EXACTLY the index a batch
  * append-over-the-same-artifacts produces, replayed batches must be
  * absorbed (at-least-once → exactly-once index content), and a killed
  * stream resumed from its checkpoint must converge to the same index.
  */
class VecIngestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def cmap(p: String) = PqIndex.read(spark, p)
    .select("vec_id", "c_id", "pq").collect()
    .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2).toList)).toMap

  test("replayed batches are absorbed; streamed index == batch append") {
    val base = java.nio.file.Files.createTempDirectory("vecingest").toString
    val emb = graft.Tables(spark, dir, "embeddings")
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val cut = maxId / 2

    // bootstrap: build over the first half (freezes the codebook)
    val halfDir = s"$base/halfdata"
    emb.filter(col("vec_id") <= cut).write.parquet(s"$halfDir/embeddings.parquet")
    def bootstrap(p: String): Unit =
      graft.queries.Similarity.buildIvfAdcIndex(spark, halfDir, p)

    // reference: one batch append of the whole second half
    val ref = s"$base/ref"
    bootstrap(ref)
    graft.queries.Similarity.appendToIvfAdcIndex(
      spark, emb.filter(col("vec_id") > cut), ref)
    val expected = cmap(ref)

    // streamed: three chunks with the SECOND chunk fully replayed
    // (at-least-once semantics) — processBatch must absorb it
    val streamed = s"$base/streamed"
    bootstrap(streamed)
    val rest = emb.filter(col("vec_id") > cut)
      .select("vec_id", "label", "embedding").orderBy("vec_id").collect()
    val chunks = rest.grouped(math.max(1, rest.length / 3)).toSeq
    for ((chunk, i) <- chunks.zipWithIndex) {
      import spark.implicits._
      val b = chunk.toSeq
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2)))
        .toDF("vec_id", "label", "embedding")
      VecIngest.processBatch(b, streamed)
      if (i == 1) VecIngest.processBatch(b, streamed) // crash replay
    }
    assert(cmap(streamed) === expected,
      "streamed ingest diverged from the batch append")
  }

  test("kill mid-stream, resume from checkpoint: index converges to the batch append") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("vecingestkill").toString
    val emb = graft.Tables(spark, dir, "embeddings")
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val cut = maxId / 2
    val halfDir = s"$base/halfdata"
    emb.filter(col("vec_id") <= cut).write.parquet(s"$halfDir/embeddings.parquet")
    val idx = s"$base/idx"
    graft.queries.Similarity.buildIvfAdcIndex(spark, halfDir, idx)
    val ref = s"$base/ref"
    graft.queries.Similarity.buildIvfAdcIndex(spark, halfDir, ref)
    graft.queries.Similarity.appendToIvfAdcIndex(
      spark, emb.filter(col("vec_id") > cut), ref)

    val rest = emb.filter(col("vec_id") > cut)
      .select("vec_id", "label", "embedding").orderBy("vec_id").collect()
      .map(r => VecEvent(r.getLong(0), r.getInt(1), r.getSeq[Float](2)))
    val ckpt = s"$base/ckpt"
    val mem1 = MemoryStream[VecEvent]
    val q1 = VecIngest.start(mem1.toDF(), idx, Some(ckpt))
    try {
      mem1.addData(rest.take(rest.length / 2).toSeq)
      q1.processAllAvailable()
    } finally q1.stop() // kill

    val mem2 = MemoryStream[VecEvent]
    mem2.addData(rest.toSeq) // the full tail re-offered on resume
    val q2 = VecIngest.start(mem2.toDF(), idx, Some(s"$base/ckpt2"))
    try q2.processAllAvailable() finally q2.stop()

    assert(cmap(idx) === cmap(ref),
      "kill/resume ingest diverged from the batch append")
  }
}
