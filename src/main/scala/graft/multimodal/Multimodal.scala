package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside an opaque media payload. */
case class MediaMeta(
    mediaType: String,   // "image" | "audio" | "video"
    width: Int, height: Int,
    sampleRateHz: Int, durationMs: Long)

/** One media row: payload is an opaque binary column + typed metadata —
  * the storage shape a 100 TB multimodal corpus uses (never decode into
  * the table; decode at read time, close to the consumer).
  */
case class MediaRow(doc_id: Long, content: Array[Byte], meta: MediaMeta)

/** Extracted feature vector for one media item (or one sampled frame). */
case class MediaFeature(doc_id: Long, frame_index: Int, features: Array[Float])

/** Multimodal-column plumbing (SURVEY.md §7.4 / builder spec): binary
  * payload columns with typed metadata, batch-shaped decode/feature
  * extraction, frame sampling, and metadata-level resize.
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs,
  * so [[decodeStub]] produces a deterministic fake (seeded by the
  * payload bytes). Everything AROUND it is the real Spark shape — per
  * partition batching via `mapPartitions` (one decoder init per
  * partition, not per row — the same batching contract a Pandas UDF /
  * `mapInPandas` gives PySpark), typed schemas, and narrow (shuffle-
  * free) execution. Swapping the stub for a real codec changes no plan.
  */
object Multimodal {

  /** STUB — deterministic fake "decoder": seeds a tiny xorshift PRNG
    * with a fingerprint of the payload and emits `dim` floats in [0,1).
    * A real implementation decodes pixels/samples here; marked clearly
    * so no result of it is mistaken for real vision/audio features.
    */
  def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    var seed = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < content.length) { seed = (seed ^ content(i)) * 0x100000001b3L; i += 1 }
    val out = new Array[Float](dim)
    var x = if (seed == 0) 1L else seed
    i = 0
    while (i < dim) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      out(i) = ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat
      i += 1
    }
    out
  }

  /** Synthesize a media table from `documents` — deterministic fake
    * payloads (the fixtures ship no real media). Payload = UTF-8 of the
    * text; metadata derived from doc_id. Synthetic by construction,
    * used so the plumbing is exercised end-to-end on the driver tables.
    */
  def attachMedia(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val mt = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRow(id, text.getBytes("UTF-8"),
          MediaMeta(mt, width = 64 + (id % 8).toInt * 16, height = 64,
            sampleRateHz = if (mt == "audio") 16000 else 0,
            durationMs = if (mt == "image") 0L else nChars * 10L))
      }
  }

  /** Batch-shaped feature extraction: one decoder "session" per
    * partition (the `init` thunk), then row-at-a-time decode within the
    * partition — the Scala analogue of `mapInPandas`'s batch contract.
    * Narrow op: no shuffle; partitioning of the input is preserved.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize the (expensive) codec/model once here
      val decoder: Array[Byte] => Array[Float] = decodeStub(_, dim)
      rows.map(r => MediaFeature(r.doc_id, frame_index = 0, decoder(r.content)))
    }
  }

  /** Frame indices sampled for one media row: k evenly-spaced frames
    * for video with positive duration, the single frame 0 otherwise.
    * Shared by [[sampleFrames]] (decode path, m01) and [[metaTable]]
    * (metadata-only path, m02) so the row multiplication the oracle
    * gates is the code path the decode pipeline uses.
    */
  def frameIndices(meta: MediaMeta, k: Int): Range =
    if (meta.mediaType == "video" && meta.durationMs > 0) 0 until k else 0 until 1

  /** Frame sampling for video rows: k evenly-spaced frame indices, each
    * decoded independently — explodes one row into k feature rows.
    * Non-video rows pass through as frame 0.
    */
  def sampleFrames(media: Dataset[MediaRow], k: Int = 4, dim: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder: (Array[Byte], Int) => Array[Float] =
        (bytes, frame) => decodeStub(bytes :+ frame.toByte, dim)
      rows.flatMap(r => frameIndices(r.meta, k).iterator
        .map(f => MediaFeature(r.doc_id, f, decoder(r.content, f))))
    }
  }

  /** Metadata-level resize: a pure column transform (no payload decode —
    * at scale the payload bytes are untouched until the consumer).
    */
  def resizeMeta(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val m = r.meta
      val s = math.max(m.width, m.height)
      if (s <= maxSide || s == 0) r
      else {
        val scale = maxSide.toDouble / s
        r.copy(meta = m.copy(
          width = math.max(1, (m.width * scale).toInt),
          height = math.max(1, (m.height * scale).toInt)))
      }
    }
  }

  /** m02: the metadata half of the multimodal pipeline — attach →
    * [[resizeMeta]] → [[frameIndices]] row multiplication — with the
    * payload untouched. Everything here is pure arithmetic on
    * (doc_id, meta), so it IS SQL-expressible and oracle-gated
    * (hash-exact vs DuckDB), leaving only the decode stub (m01)
    * rows-only. The resize arithmetic goes through the same double
    * ops in both engines (scale = maxSide/s first, then w·scale,
    * truncated toward zero) so the dims are bit-identical.
    */
  def metaTable(spark: SparkSession, dir: String, maxSide: Int = 96,
      k: Int = 4): DataFrame = {
    import spark.implicits._
    val media = resizeMeta(attachMedia(graft.Tables(spark, dir, "documents")), maxSide)
    media.flatMap { r =>
      frameIndices(r.meta, k).map(f =>
        (r.doc_id, r.meta.mediaType, r.meta.width, r.meta.height,
          r.meta.sampleRateHz, r.meta.durationMs, f))
    }.toDF("doc_id", "media_type", "width", "height",
        "sample_rate_hz", "duration_ms", "frame_index")
      .orderBy("doc_id", "frame_index")
  }

  /** Media feature summary exposed through the driver contract (rows-only
    * check: the decode stub is engine-side, not SQL-expressible).
    */
  def featureSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = attachMedia(graft.Tables(spark, dir, "documents"))
    extractFeatures(media)
      .map(f => (f.doc_id, f.features.length, f.features.sum.toDouble))
      .toDF("doc_id", "dim", "feature_sum")
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decode path: rows-only by necessity (stubbed decoder is
    // engine-side, not SQL-expressible)
    "m01_media_features" -> ((s, dir) => featureSummary(s, dir)),
    // metadata path: fully oracle-gated (pure arithmetic on doc_id and
    // n_chars in both engines)
    "m02_media_meta" -> ((s, dir) => metaTable(s, dir)))

  /** DuckDB mirror of [[attachMedia]] → [[resizeMeta]] (maxSide 96) →
    * [[frameIndices]] (k = 4): same integer arithmetic, same double op
    * order for the resize scale (96.0 / s first, then w·scale, floor =
    * truncation for positives), same conditional frame multiplication.
    */
  def oracleSql: Map[String, String] = Map(
    "m02_media_meta" ->
      """WITH m AS (SELECT doc_id, n_chars,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(64 + (doc_id % 8) * 16 AS INT) AS w0, CAST(64 AS INT) AS h0 FROM documents),
        |r AS (SELECT doc_id, media_type,
        |  CAST(CASE WHEN greatest(w0, h0) <= 96 THEN w0
        |       ELSE greatest(1, CAST(floor(w0 * (96.0 / greatest(w0, h0))) AS INT)) END AS INT) AS width,
        |  CAST(CASE WHEN greatest(w0, h0) <= 96 THEN h0
        |       ELSE greatest(1, CAST(floor(h0 * (96.0 / greatest(w0, h0))) AS INT)) END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INT) AS sample_rate_hz,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE n_chars * 10 END AS BIGINT) AS duration_ms
        |  FROM m),
        |f AS (SELECT r.*, unnest(CASE WHEN media_type = 'video' AND duration_ms > 0
        |  THEN range(0, 4) ELSE [CAST(0 AS BIGINT)] END) AS fi FROM r)
        |SELECT doc_id, media_type, width, height, sample_rate_hz, duration_ms,
        |  CAST(fi AS INT) AS frame_index
        |FROM f ORDER BY doc_id, frame_index""".stripMargin)
}
