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

  // -------------------------------------------------------------------
  // Media near-dup (m03, r19 verdict ask #3): the multimodal tier's
  // first-class dedup operator — a 64-bit perceptual AVERAGE-HASH
  // (aHash, the classic public perceptual-fingerprint: downsample to
  // an 8×8 grid, threshold each cell's mean against the global mean)
  // computed from REAL decoded BMP pixels, then d05's pigeonhole-exact
  // banded hamming join (Dedup.simhashPairs' machinery at 64 bits:
  // 4 × 16-bit bands; any pair within hamming ≤ 3 agrees on ≥ 1 band,
  // so the band join loses nothing for the ≤ 3 predicate).
  // -------------------------------------------------------------------

  /** m03's planted image generator: the fixture corpus carries no real
    * near-dup images, so — exactly like [[attachMedia]]'s closed-form
    * pixel values make m01 oracle-checkable — the m03 images PAINT a
    * deterministic 64-bit cell pattern that the DuckDB oracle can
    * recompute with integer arithmetic, while the Spark side recovers
    * it only by genuinely decoding the BMP (stride padding, BGR order,
    * bottom-up rows) and running the real average-hash kernel.
    *
    * Image docs (doc_id % 3 == 0) group into runs of 8 (`group` =
    * doc_id/24); each group has a pseudo-random base pattern
    * `baseBit(group, j)` and member m = (doc_id%24)/3 flips cells
    * j < m — so within a group, members' painted patterns differ by
    * exactly |Δm| cells (the flip masks' symmetric difference), giving
    * deterministic hamming-≤3 sibling pairs at every SF, while
    * cross-group patterns differ pseudo-randomly (~32 of 64 bits).
    * Cell (cy, cx) of the 8×8 grid paints all its pixels 200 (bit set)
    * or 50 — uniform cells, so the average-hash recovers the painted
    * bits exactly (the one degenerate case, all-64-set ⇒ mean = cell
    * value ⇒ all hash bits 0, is mirrored in the oracle's n1 = 64
    * branch and never occurs under the pseudo-random base).
    *
    * The mixer must genuinely WRAP its modulus or patterns degenerate:
    * the first cut (`(g·48271 + j·40503) % 2³¹−1 % 2`) never exceeded
    * the modulus at fixture group counts, so with both multipliers odd
    * it collapsed to parity(g) XOR parity(j) — TWO distinct base
    * patterns corpus-wide, which made cross-group hashes collide en
    * masse (476 k pairs at sf0.1, the banded join degenerating toward
    * all-pairs). And multiply-mod rounds on PRIME moduli are not
    * enough either (r19, measured): fold-then-multiply parity
    * decomposes as parity(h0) XOR parity(⌊h0·C/M⌋) — h0's parity is
    * linear in (g, j), so the output bits keep a linear component and
    * patterns correlate across groups. At the gate SFs (≤ ~200
    * groups) that is invisible, but at the 100× replica's 20.9 k
    * groups the 64-bit patterns collapsed to 3,548 distinct values
    * and the pair relation exploded to 31.5 M rows (~190 pairs/image
    * — MediaNearDupProbe, BENCHNOTES r19); a second round still left
    * a ~180 k cross-group remnant. The fix is a genuine AVALANCHE
    * mixer — the xorshift-multiply round (h ^= h>>16; h = h·C masked
    * to 31 bits, twice, final xorshift; Wang-style integer hash),
    * which has no modular-linear structure: at the full 20.9 k-group
    * replica scale every base pattern is distinct, sampled min
    * cross-group distance ≈ 15 bits (so prefix flips of ≤ 7 bits can
    * never pull a cross pair under the hamming-3 threshold), popcount
    * balanced 32 ± 4. Pair volume is EXACTLY the within-group planted
    * relation at every scale. 31-bit lanes keep every product under
    * 2⁵⁸ — Long- and DuckDB-BIGINT-safe at any replica doc_id — and
    * `&`/`>>`/xor all exist on BIGINT in the oracle dialect.
    */
  def baseBit(group: Long, j: Int): Int = {
    var h = (group * 64L + j) & 2147483647L
    h ^= h >> 16; h = (h * 73244475L) & 2147483647L
    h ^= h >> 16; h = (h * 73244475L) & 2147483647L
    h ^= h >> 16
    (h & 1L).toInt
  }

  /** Painted bit of cell j for image doc `docId` (doc_id % 3 == 0). */
  def paintedBit(docId: Long, j: Int): Int = {
    val flip = if (j < (docId % 24) / 3) 1 else 0
    baseBit(docId / 24, j) ^ flip
  }

  def attachMediaNearDup(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).filter(col("doc_id") % 3 === 0)
      .as[Long].map { id =>
        val w = 64 + (id % 8).toInt * 16
        val h = 64
        val (cw, ch) = (w / 8, h / 8)
        val px = new Array[Int](w * h * 3)
        var j = 0
        while (j < 64) {
          val v = if (paintedBit(id, j) == 1) 200 else 50
          val (cy, cx) = (j / 8, j % 8)
          var y = cy * ch
          while (y < (cy + 1) * ch) {
            var x = cx * cw
            while (x < (cx + 1) * cw) {
              val base = (y * w + x) * 3
              px(base) = v; px(base + 1) = v; px(base + 2) = v
              x += 1
            }
            y += 1
          }
          j += 1
        }
        MediaRow(id, MediaCodec.encodeBmp(px, w, h),
          MediaMeta("image", width = w, height = h, sampleRateHz = 0,
            durationMs = 0L))
      }
  }

  /** 64-bit average-hash of a decoded image: sum every channel value
    * per 8×8 grid cell (ragged cell bounds when dims aren't multiples
    * of 8 — exact integer arithmetic either way), set bit cy*8+cx iff
    * the cell mean exceeds the global mean. The comparison is the
    * cross-multiplied integer form cellSum·totCount > totSum·cellCount
    * — no division, no doubles, so the oracle's closed-form recompute
    * is equal by construction, not by rounding luck. (Bounds: cellSum
    * ≤ 255·3·22·8 < 2¹⁸ and totCount ≤ 176·64·3 < 2¹⁶, so the products
    * stay far under Long overflow.)
    */
  def avgHash(d: Decoded): Long = {
    require(d.kind == "bmp", s"avgHash expects an image, got ${d.kind}")
    val (w, h) = (d.width, d.height)
    // overflow guard (r20, ADVICE): the cross-multiplied compare's
    // products are bounded by 2295·(w·h)², which stays under 2⁶³ only
    // for w·h < ~6.3e7 pixels — far above any fixture, but the BMP
    // decoder's 2 GB bound admits larger; fail loudly rather than
    // silently wrap
    require(w.toLong * h <= 63000000L,
      s"avgHash: image ${w}x$h exceeds the exact-integer compare bound " +
        "(w*h must be <= 6.3e7); downsample before hashing")
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var tot = 0L
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val cx = x * 8 / w
        val base = (y * w + x) * 3
        val s = (d.values(base) + d.values(base + 1) + d.values(base + 2)).toLong
        cellSum(cy * 8 + cx) += s
        cellCnt(cy * 8 + cx) += 3
        tot += s
        x += 1
      }
      y += 1
    }
    val totCnt = w.toLong * h * 3
    var hash = 0L
    var j = 0
    while (j < 64) {
      if (cellSum(j) * totCnt > tot * cellCnt(j)) hash |= (1L << j)
      j += 1
    }
    hash
  }

  /** Per-image perceptual fingerprints through the REAL decode path
    * (one decoder per partition, the batch contract): (doc_id, ph).
    * Narrow — no shuffle; the hash is 8 bytes per image, the only
    * thing the downstream join ever moves.
    */
  def perceptualHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder: Array[Byte] => Decoded = MediaCodec.decode
      rows.map(r => (r.doc_id, avgHash(decoder(r.content))))
    }.toDF("doc_id", "ph")
  }

  /** Hamming-≤`maxHamming` fingerprint pairs via the pigeonhole-exact
    * banded join (d05's machinery — `Dedup.simhashPairs`,
    * queries/Dedup.scala — at 64 bits): 4 × 16-bit bands; a pair
    * within hamming ≤ 3 differs in ≤ 3 bands so agrees on ≥ 1, and
    * the band join finds it — EXACT, no recall loss. Scale: the join
    * key is (band index, band value) — candidate volume is Σ bucket²
    * over 16-bit buckets, never all-pairs; only 8-byte hashes cross
    * the shuffle. Columns: a_id, b_id, hamming.
    */
  def mediaNearDupPairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bands = sigs.select(col("doc_id"), col("ph"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("j"),
            shiftright(col("ph"), j * 16).bitwiseAND(lit(65535L)).as("w"))): _*)).as("b"))
      .select(col("doc_id"), col("ph"), col("b.j").as("j"), col("b.w").as("w"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.j") === col("y.j") && col("x.w") === col("y.w") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("x.ph").as("a_sig"),
        col("y.doc_id").as("b_id"), col("y.ph").as("b_sig"))
      .distinct()
    cand.filter(bit_count(col("a_sig").bitwiseXOR(col("b_sig"))) <= maxHamming)
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).cast("int").as("hamming"))
  }

  /** m03: the end-to-end media near-dup operator — planted BMPs →
    * real decode → [[avgHash]] → banded hamming pairs. The oracle
    * recomputes the painted pattern and the thresholded hash with
    * closed-form integer arithmetic (it never sees a BMP byte), so
    * agreement proves the whole Spark pipeline: codec round trip,
    * grid/threshold kernel, and the banded join's exactness.
    */
  def mediaNearDup(spark: SparkSession, dir: String): DataFrame =
    mediaNearDupPairs(perceptualHashes(
      attachMediaNearDup(graft.Tables(spark, dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism))))
      .orderBy("a_id", "b_id")

  /** Audio base pattern for m04 — [[baseBit]]'s avalanche mixer with
    * an independent multiplier (2246822519, xxhash's prime2 truncated
    * to 31 bits of product headroom: h < 2³¹ so h·C < 2⁶² — Long- and
    * DuckDB-BIGINT-safe), giving the audio modality its own pattern
    * family. Scale-checked like the image mixer (r19 lesson): all
    * 20,900 base patterns distinct at the 100× replica's group count,
    * sampled min cross-group distance 14 bits — prefix flips of ≤ 7
    * bits can never create a cross-group pair at hamming ≤ 3, so the
    * m04 pair relation is exactly the planted within-group rows.
    */
  def audioBaseBit(group: Long, j: Int): Int = {
    var h = (group * 64L + j) & 2147483647L
    h ^= h >> 16; h = (h * 2246822519L) & 2147483647L
    h ^= h >> 16; h = (h * 2246822519L) & 2147483647L
    h ^= h >> 16
    (h & 1L).toInt
  }

  /** Painted bit of window j for audio doc `docId` (doc_id % 3 == 1) —
    * the same prefix-flip sibling structure as the image fixture:
    * docs ≡ 1 (mod 3) inside a 24-id group carry member indices
    * m = (doc_id % 24) / 3 ∈ 0..7, and member m flips the first m
    * window bits of the group's base pattern, so within-group hamming
    * is exactly |Δm|.
    */
  def audioPaintedBit(docId: Long, j: Int): Int = {
    val flip = if (j < (docId % 24) / 3) 1 else 0
    audioBaseBit(docId / 24, j) ^ flip
  }

  /** m04's audio fixture: every doc_id ≡ 1 (mod 3) gets a mono PCM16
    * WAV of 64 uniform-amplitude windows — window j's samples are all
    * 12000 when [[audioPaintedBit]] is set, 3000 otherwise (both
    * positive, so window MEANS recover the bits; PCM16 is lossless,
    * so the real encode→decode round trip preserves them exactly).
    * Window width varies with the doc (32 + (id % 8)·8 samples) the
    * way the image fixture varies width — ragged window bounds on the
    * decode side are exercised, not just the aligned case.
    */
  def attachAudioNearDup(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).filter(col("doc_id") % 3 === 1)
      .as[Long].map { id =>
        val w = 32 + (id % 8).toInt * 8
        val samples = new Array[Int](64 * w)
        var j = 0
        while (j < 64) {
          val v = if (audioPaintedBit(id, j) == 1) 12000 else 3000
          var i = j * w
          while (i < (j + 1) * w) { samples(i) = v; i += 1 }
          j += 1
        }
        MediaRow(id, MediaCodec.encodeWav(samples, 16000),
          MediaMeta("audio", width = 0, height = 0, sampleRateHz = 16000,
            durationMs = samples.length * 1000L / 16000))
      }
  }

  /** 64-bit fingerprint of a decoded audio clip — [[avgHash]]'s exact
    * integer form on the time axis: sum the samples of each of 64
    * ragged windows (window of sample i = i·64/n), set bit j iff the
    * window mean exceeds the global mean via the cross-multiplied
    * compare winSum·n > totSum·winCnt. Bounds: |winSum| ≤ 32767·89
    * < 2²², n < 2¹³, totSum < 2²⁸ — every product far under Long
    * overflow, and the oracle never needs the arithmetic at all (the
    * closed-form painted bits ARE the hash bits, all-set degenerate
    * case aside, mirrored in the n1 = 64 branch like m03).
    */
  def audioHash(d: Decoded): Long = {
    require(d.kind == "wav", s"audioHash expects audio, got ${d.kind}")
    val n = d.values.length
    // overflow guard (r20, ADVICE): |winSum·n| and |tot·winCnt| are
    // bounded by 32768·n², under 2⁶³ only for n < 2²⁴ samples (~17 min
    // at 16 kHz); the WAV decoder admits longer clips — fail loudly
    require(n < (1 << 24),
      s"audioHash: clip of $n samples exceeds the exact-integer compare " +
        "bound (n must be < 2^24); window-chunk before hashing")
    val winSum = new Array[Long](64)
    val winCnt = new Array[Long](64)
    var tot = 0L
    var i = 0
    while (i < n) {
      val j = (i.toLong * 64 / n).toInt
      winSum(j) += d.values(i)
      winCnt(j) += 1
      tot += d.values(i)
      i += 1
    }
    var hash = 0L
    var j = 0
    while (j < 64) {
      if (winSum(j) * n > tot * winCnt(j)) hash |= (1L << j)
      j += 1
    }
    hash
  }

  /** Per-clip audio fingerprints through the REAL decode path — the
    * audio twin of [[perceptualHashes]]: narrow, no shuffle, 8 bytes
    * per clip downstream.
    */
  def audioHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder: Array[Byte] => Decoded = MediaCodec.decode
      rows.map(r => (r.doc_id, audioHash(decoder(r.content))))
    }.toDF("doc_id", "ph")
  }

  /** m04: near-dup detection over the AUDIO modality — planted WAVs →
    * real RIFF decode → [[audioHash]] → the SAME banded hamming join
    * as m03 ([[mediaNearDupPairs]] is fingerprint-generic). With m03
    * this closes the multimodal dedup story: one pigeonhole-exact
    * pair machinery, two real codecs feeding it.
    */
  def audioNearDup(spark: SparkSession, dir: String): DataFrame =
    mediaNearDupPairs(audioHashes(
      attachAudioNearDup(graft.Tables(spark, dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism))))
      .orderBy("a_id", "b_id")

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
    "m02_media_meta" -> ((s, dir) => metaTable(s, dir)),
    // media near-dup: real decode -> average-hash -> pigeonhole-banded
    // hamming pairs, oracle-gated on the closed-form painted pattern
    "m03_media_neardup" -> ((s, dir) => mediaNearDup(s, dir)),
    // audio near-dup: real WAV decode feeding the same banded join
    "m04_audio_neardup" -> ((s, dir) => audioNearDup(s, dir)))

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
        |FROM f ORDER BY doc_id, frame_index""".stripMargin,
    // m03: the painted 64-bit pattern recomputed closed-form (baseBit's
    // avalanche mixer — two xorshift-multiply rounds masked to 31 bits,
    // final xorshift, parity bit — prefix flips per member),
    // the average-hash threshold mirrored exactly (uniform 200/50 cells
    // => bit = painted unless ALL 64 cells are 200, the n1 < 64 branch),
    // and all-pairs hamming via bit_count(xor) — the SQL never touches
    // a BMP byte, so agreement proves the decode+kernel+banding path
    "m03_media_neardup" ->
      """WITH img AS (SELECT doc_id, doc_id // 24 AS g, (doc_id % 24) // 3 AS m
        |  FROM documents WHERE doc_id % 3 = 0),
        |h0 AS (SELECT doc_id, j, m, (g * 64 + j) & 2147483647 AS v
        |  FROM img, (SELECT unnest(range(0, 64)) AS j)),
        |h1 AS (SELECT doc_id, j, m,
        |    (xor(v, v >> 16) * 73244475) & 2147483647 AS v FROM h0),
        |h2 AS (SELECT doc_id, j, m,
        |    (xor(v, v >> 16) * 73244475) & 2147483647 AS v FROM h1),
        |pb AS (SELECT doc_id, j,
        |    ((xor(v, v >> 16) & 1)
        |      + CASE WHEN j < m THEN 1 ELSE 0 END) % 2 AS p
        |  FROM h2),
        |n AS (SELECT doc_id, sum(p) AS n1 FROM pb GROUP BY 1),
        |hb AS (SELECT pb.doc_id, pb.j,
        |    CASE WHEN pb.p = 1 AND n.n1 < 64 THEN 1 ELSE 0 END AS hbit
        |  FROM pb JOIN n USING (doc_id)),
        |h AS (SELECT doc_id, CAST(sum(CASE WHEN hbit = 1 THEN
        |    CASE WHEN j = 63 THEN (-9223372036854775807 - 1)
        |         ELSE CAST(1 AS BIGINT) << j END
        |    ELSE 0 END) AS BIGINT) AS ph FROM hb GROUP BY 1)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,

    // m04: m03's oracle shape over the audio family — doc_id ≡ 1
    // (mod 3), the audio mixer constant, the same all-set degenerate
    // branch (every window mean == global mean ⇒ strict > gives hash
    // 0). The painted bits ARE the hash bits, so the oracle proves
    // the whole WAV encode→decode→window-threshold pipeline.
    "m04_audio_neardup" ->
      """WITH aud AS (SELECT doc_id, doc_id // 24 AS g, (doc_id % 24) // 3 AS m
        |  FROM documents WHERE doc_id % 3 = 1),
        |h0 AS (SELECT doc_id, j, m, (g * 64 + j) & 2147483647 AS v
        |  FROM aud, (SELECT unnest(range(0, 64)) AS j)),
        |h1 AS (SELECT doc_id, j, m,
        |    (xor(v, v >> 16) * 2246822519) & 2147483647 AS v FROM h0),
        |h2 AS (SELECT doc_id, j, m,
        |    (xor(v, v >> 16) * 2246822519) & 2147483647 AS v FROM h1),
        |pb AS (SELECT doc_id, j,
        |    ((xor(v, v >> 16) & 1)
        |      + CASE WHEN j < m THEN 1 ELSE 0 END) % 2 AS p
        |  FROM h2),
        |n AS (SELECT doc_id, sum(p) AS n1 FROM pb GROUP BY 1),
        |hb AS (SELECT pb.doc_id, pb.j,
        |    CASE WHEN pb.p = 1 AND n.n1 < 64 THEN 1 ELSE 0 END AS hbit
        |  FROM pb JOIN n USING (doc_id)),
        |h AS (SELECT doc_id, CAST(sum(CASE WHEN hbit = 1 THEN
        |    CASE WHEN j = 63 THEN (-9223372036854775807 - 1)
        |         ELSE CAST(1 AS BIGINT) << j END
        |    ELSE 0 END) AS BIGINT) AS ph FROM hb GROUP BY 1)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 3
        |ORDER BY a_id, b_id""".stripMargin)
}
