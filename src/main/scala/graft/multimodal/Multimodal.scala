package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
  * The decode step is REAL: payloads are genuine 24-bit BMP images and
  * PCM16 WAV audio (the two formats a pure JVM can encode/decode with
  * no native codecs — see [[MediaCodec]]), and [[featureSummary]] (m01)
  * parses headers, undoes BMP's bottom-up BGR row layout / walks WAV's
  * RIFF chunks, and aggregates the recovered values. Because the
  * synthesized pixel/sample values follow a closed-form generator (a
  * linear function of doc_id and index — see [[attachMedia]]), the
  * decoded aggregates are independently recomputable in DuckDB SQL, so
  * m01 is hash-exact oracle-gated like every other query: any header
  * mis-parse, row-order or byte-order mistake changes the sum and fails
  * the gate.
  *
  * Execution shape: per-partition batching via `mapPartitions` (one
  * decoder init per partition, not per row — the same batching contract
  * a Pandas UDF / `mapInPandas` gives PySpark), typed schemas, narrow
  * (shuffle-free) decode. Swapping the synthetic payloads for real
  * JPEG/FLAC bytes changes only the codec dispatch, no plan.
  */
object Multimodal {

  /** Pixel-value generator for image payloads: value of logical pixel
    * byte `i` (top-down row-major RGB) — linear in (doc_id, i) so the
    * oracle can recompute it in SQL.
    */
  def pixelValue(docId: Long, i: Long): Int = ((docId * 31 + i * 7) % 256).toInt

  /** Sample-value generator for audio/video payloads: PCM16 sample `i`. */
  def sampleValue(docId: Long, i: Long): Int =
    ((docId * 131 + i * 17) % 65536).toInt - 32768

  /** Payload length in values: image = width*height*3 pixel bytes;
    * audio = 256 + (doc_id % 256) samples; video = 1024 samples (the
    * fixed-length audio-track proxy the frame sampler slices).
    */
  def valueCount(docId: Long, mediaType: String, width: Int, height: Int): Int =
    mediaType match {
      case "image" => width * height * 3
      case "audio" => 256 + (docId % 256).toInt
      case _       => 1024
    }

  /** Synthesize a media table from `documents` — REAL encoded payloads
    * (24-bit BMP for images, PCM16 WAV for audio/video) over
    * deterministic generated values (the fixtures ship no real media;
    * closed-form values keep m01 oracle-checkable). Metadata derived
    * from doc_id/n_chars exactly as m02's oracle mirrors.
    */
  def attachMedia(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, nChars) =>
        val mt = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val w = 64 + (id % 8).toInt * 16
        val h = 64
        val n = valueCount(id, mt, w, h)
        val payload = mt match {
          case "image" =>
            val px = Array.tabulate(n)(i => pixelValue(id, i))
            MediaCodec.encodeBmp(px, w, h)
          case _ =>
            val sm = Array.tabulate(n)(i => sampleValue(id, i))
            MediaCodec.encodeWav(sm, 16000)
        }
        MediaRow(id, payload,
          MediaMeta(mt, width = w, height = h,
            sampleRateHz = if (mt == "audio") 16000 else 0,
            durationMs = if (mt == "image") 0L else nChars * 10L))
      }
  }

  /** Mean-pool `values` into `dim` equal segments — the fixed-dim
    * feature a variable-length decode feeds downstream (empty segments,
    * when values.length < dim, pool to 0).
    */
  private[multimodal] def meanPool(values: Array[Int], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = values.length
    var j = 0
    while (j < dim) {
      val start = (j.toLong * n / dim).toInt
      val end = ((j + 1).toLong * n / dim).toInt
      if (end > start) {
        var s = 0L
        var i = start
        while (i < end) { s += values(i); i += 1 }
        out(j) = (s.toDouble / (end - start)).toFloat
      }
      j += 1
    }
    out
  }

  /** Batch-shaped feature extraction: one decoder "session" per
    * partition (the per-partition block), then row-at-a-time decode
    * within it — the Scala analogue of `mapInPandas`'s batch contract.
    * Narrow op: no shuffle; partitioning of the input is preserved.
    * Features = decoded values mean-pooled to `dim` segments.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize the (expensive) codec/model once here
      val decoder: Array[Byte] => Decoded = MediaCodec.decode
      rows.map(r => MediaFeature(r.doc_id, frame_index = 0,
        meanPool(decoder(r.content).values, dim)))
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

  /** Frame sampling for video rows: the decoded value stream splits into
    * k evenly-spaced segments ("frames"), each pooled independently —
    * explodes one row into k feature rows. Non-video rows pass through
    * whole as frame 0.
    */
  def sampleFrames(media: Dataset[MediaRow], k: Int = 4, dim: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder: Array[Byte] => Decoded = MediaCodec.decode
      rows.flatMap { r =>
        val vals = decoder(r.content).values
        val frames = frameIndices(r.meta, k)
        val nf = frames.length
        frames.iterator.map { f =>
          val slice = java.util.Arrays.copyOfRange(
            vals, (f.toLong * vals.length / nf).toInt,
            ((f + 1).toLong * vals.length / nf).toInt)
          MediaFeature(r.doc_id, f, meanPool(slice, dim))
        }
      }
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
    // COLUMNAR on purpose: the metadata path must never materialize
    // payload bytes (at 100 TB the payload column stays on disk —
    // parquet column pruning — and everything here is codegen'd column
    // arithmetic). The expressions mirror attachMedia → resizeMeta →
    // frameIndices exactly — same integer ops, same double op order
    // (scale = maxSide/s first, then w·scale, floor = truncation for
    // positives) — and MultimodalSpec pins the agreement against the
    // case-class path row for row.
    val d = graft.Tables(spark, dir, "documents").select(col("doc_id"), col("n_chars"))
    val mt = when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio").otherwise("video")
    val w0 = (lit(64) + (col("doc_id") % 8) * 16).cast("int")
    val h0 = lit(64).cast("int")
    val side = greatest(w0, h0)
    val scale = lit(maxSide.toDouble) / side.cast("double")
    def resized(c: Column): Column =
      when(side <= maxSide || side === 0, c)
        .otherwise(greatest(lit(1), floor(c.cast("double") * scale).cast("int")))
    d.select(col("doc_id"), mt.as("media_type"),
        resized(w0).as("width"), resized(h0).as("height"),
        when(col("doc_id") % 3 === 1, 16000).otherwise(0).cast("int").as("sample_rate_hz"),
        when(col("doc_id") % 3 === 0, 0L).otherwise(col("n_chars") * 10).as("duration_ms"))
      .withColumn("frame_index",
        explode(when(col("media_type") === "video" && col("duration_ms") > 0,
          sequence(lit(0), lit(k - 1))).otherwise(array(lit(0)))))
      .orderBy("doc_id", "frame_index")
  }

  /** m01: decoded-value summary through the REAL decode path — parse
    * the binary payload (BMP or WAV by magic sniff), recover the
    * logical pixel/sample values, and aggregate exact integers
    * (count/sum/min/max — no floats, so the cross-engine compare is
    * trivially bit-exact). For image rows the decoder's header dims are
    * cross-checked against the catalog metadata — a real pipeline's
    * corruption guard. The oracle recomputes the same aggregates from
    * the closed-form generators; any decode defect (stride padding,
    * BGR order, bottom-up rows, chunk walk) breaks the hash.
    */
  def featureSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // decode parallelism: the fixtures are single small parquet files
    // (one scan partition); at warehouse scale the decode fans out over
    // file splits for free, so the stand-in is one cheap repartition of
    // the (small) pre-payload rows across the cores
    val media = attachMedia(graft.Tables(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism))
    val summary = media.mapPartitions { rows =>
      val decoder: Array[Byte] => Decoded = MediaCodec.decode
      rows.map { r =>
        val d = decoder(r.content)
        if (d.kind == "bmp") require(
          d.width == r.meta.width && d.height == r.meta.height,
          s"decoded dims ${d.width}x${d.height} != catalog ${r.meta.width}x${r.meta.height}")
        var mn = Int.MaxValue; var mx = Int.MinValue; var sm = 0L
        var i = 0
        while (i < d.values.length) {
          val v = d.values(i)
          if (v < mn) mn = v
          if (v > mx) mx = v
          sm += v
          i += 1
        }
        (r.doc_id, r.meta.mediaType, d.values.length, sm, mn, mx)
      }
    }.toDF("doc_id", "media_type", "n_values", "value_sum", "value_min", "value_max")
    // the summary is tiny; checkpoint it so the total-order sort's
    // range-boundary sampling pass doesn't re-run the whole
    // encode→decode pipeline a second time
    summary.localCheckpoint(eager = false).orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decode path: real BMP/WAV parse, oracle-gated on exact integer
    // aggregates of the recovered values
    "m01_media_features" -> ((s, dir) => featureSummary(s, dir)),
    // metadata path: fully oracle-gated (pure arithmetic on doc_id and
    // n_chars in both engines)
    "m02_media_meta" -> ((s, dir) => metaTable(s, dir)))

  /** DuckDB mirrors. m02: [[attachMedia]] → [[resizeMeta]] (maxSide 96)
    * → [[frameIndices]] (k = 4) — same integer arithmetic, same double
    * op order. m01: the closed-form generators ([[pixelValue]] /
    * [[sampleValue]] / [[valueCount]]) re-expanded per value index and
    * aggregated — the SQL knows nothing of BMP/WAV, so agreement proves
    * the Spark side's encode→decode round trip is lossless and
    * order-exact.
    */
  def oracleSql: Map[String, String] = Map(
    "m01_media_features" ->
      """WITH d AS (SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  64 + (doc_id % 8) * 16 AS w FROM documents),
        |n AS (SELECT doc_id, media_type,
        |  CASE media_type WHEN 'image' THEN w * 64 * 3
        |       WHEN 'audio' THEN 256 + (doc_id % 256) ELSE 1024 END AS nv FROM d),
        |u AS (SELECT doc_id, media_type, nv, unnest(range(0, nv)) AS i FROM n),
        |v AS (SELECT doc_id, media_type, nv,
        |  CASE WHEN media_type = 'image' THEN (doc_id * 31 + i * 7) % 256
        |       ELSE ((doc_id * 131 + i * 17) % 65536) - 32768 END AS val FROM u)
        |SELECT doc_id, media_type, CAST(nv AS INT) AS n_values,
        |  CAST(sum(val) AS BIGINT) AS value_sum,
        |  CAST(min(val) AS INT) AS value_min, CAST(max(val) AS INT) AS value_max
        |FROM v GROUP BY doc_id, media_type, nv ORDER BY doc_id""".stripMargin,
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
