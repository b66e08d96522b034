package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** One document event on the incremental pipeline's input stream. */
case class DocEvent(doc_id: Long, ts: Timestamp,
    text: String, lang: String, source: String)

/** Incremental-vs-batch agreement for the training-data pipeline: the
  * sf0.001 corpus replayed as an in-order document stream through
  * [[DocPipeline]] must produce EXACTLY the batch p01 result (same
  * stages, same expressions — the composition is the contract).
  */
class DocPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("incremental pipeline over a replayed stream equals batch p01, for ANY batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source")
      .orderBy("doc_id")
      .collect()
      .map(r => DocEvent(r.getLong(0), new Timestamp(base + r.getLong(0) * 1000L),
        r.getString(1), r.getString(2), r.getString(3)))

    val batch = graft.SparkEntry.queries("p01_training_pipeline")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(batch.nonEmpty)

    // two different micro-batch chunkings must both agree with the
    // batch result — verdicts depend on arrival ORDER, never on where
    // the batch boundaries fall
    for (chunkSize <- Seq(13, 7)) {
      val stateDir =
        java.nio.file.Files.createTempDirectory(s"docpipe$chunkSize").toString
      val mem = MemoryStream[DocEvent]
      val q = DocPipeline.start(mem.toDF(), stateDir)
      try {
        docs.grouped(chunkSize).foreach { chunk =>
          mem.addData(chunk.toSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
      val streamed = DocPipeline.aggregate(spark, stateDir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(streamed === batch, s"chunkSize=$chunkSize")
    }
  }

  test("compaction shrinks the store file count and changes nothing observable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source").orderBy("doc_id").collect()
      .map(r => DocEvent(r.getLong(0), new Timestamp(base + r.getLong(0) * 1000L),
        r.getString(1), r.getString(2), r.getString(3)))
    val stateDir = java.nio.file.Files.createTempDirectory("docpipec").toString
    val mem = MemoryStream[DocEvent]
    val q = DocPipeline.start(mem.toDF(), stateDir)
    try {
      docs.grouped(10).foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    def parquetFiles(p: String): Int =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    val before = DocPipeline.aggregate(spark, stateDir).collect().map(_.toSeq).toSeq
    val filesBefore = parquetFiles(s"$stateDir/docs")
    DocPipeline.compact(spark, stateDir, targetFiles = 1)
    assert(parquetFiles(s"$stateDir/docs") < filesBefore)
    assert(DocPipeline.aggregate(spark, stateDir).collect().map(_.toSeq).toSeq === before)
  }

  test("a duplicate text arriving in a later batch is dropped (exact stage)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(id: Long, text: String) =
      DocEvent(id, new Timestamp(base + id * 1000L), text, "en", "web")

    val stateDir = java.nio.file.Files.createTempDirectory("docpipe2").toString
    val mem = MemoryStream[DocEvent]
    val q = DocPipeline.start(mem.toDF(), stateDir)
    val txt = "the quick brown fox jumps over the lazy dog again and again today"
    try {
      mem.addData(ev(1, txt)); q.processAllAvailable()
      mem.addData(ev(2, txt)); q.processAllAvailable() // exact dup, later batch
    } finally q.stop()
    val store = spark.read.parquet(s"$stateDir/docs")
    assert(store.count() === 1L)
    assert(store.select("doc_id").collect().head.getLong(0) === 1L)
  }
}
