package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Decoded media payload: the raw sample/pixel values in logical order
  * plus the header-derived shape (width/height for images, sample rate
  * for audio; zeros where not applicable).
  */
case class Decoded(
    kind: String,          // "bmp" | "wav"
    values: Array[Int],    // pixels 0..255 (RGB top-down row-major) | PCM16 samples
    width: Int, height: Int,
    sampleRateHz: Int)

/** Pure-JVM codecs for the two headerless-simple formats the sandbox can
  * decode without native libraries: 24-bit uncompressed BMP and 16-bit
  * PCM mono WAV. These are REAL encoders/decoders — BMP's bottom-up row
  * order, BGR byte order and 4-byte row padding, and WAV's RIFF chunk
  * walk are handled faithfully — so the m01 decode path exercises a
  * genuine parse, not a stub, and a corrupt payload fails loudly.
  *
  * Logical value order (what [[decodeBmp]] returns and [[encodeBmp]]
  * accepts): top-down row-major RGB triples — pixel (x, y) occupies
  * indices (y*width + x)*3 + {0=R, 1=G, 2=B}. The file stores rows
  * bottom-up in BGR; the codec performs the swap both ways.
  */
object MediaCodec {

  private val BmpHeaderSize = 14 + 40 // file header + BITMAPINFOHEADER

  private def bmpRowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Encode `values` (length must be width*height*3, each 0..255) as an
    * uncompressed 24-bit BMP.
    */
  def encodeBmp(values: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(values.length == width * height * 3,
      s"pixel array length ${values.length} != $width*$height*3")
    val stride = bmpRowStride(width)
    val dataSize = stride * height
    val buf = ByteBuffer.allocate(BmpHeaderSize + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(BmpHeaderSize + dataSize) // file size
    buf.putInt(0)                        // reserved
    buf.putInt(BmpHeaderSize)            // pixel data offset
    buf.putInt(40)                       // BITMAPINFOHEADER size
    buf.putInt(width)
    buf.putInt(height)                   // positive => bottom-up rows
    buf.putShort(1)                      // planes
    buf.putShort(24)                     // bits per pixel
    buf.putInt(0)                        // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835)        // 72 dpi in px/m
    buf.putInt(0).putInt(0)              // palette sizes
    var fy = 0 // file row index, bottom-up
    while (fy < height) {
      val y = height - 1 - fy
      var x = 0
      while (x < width) {
        val base = (y * width + x) * 3
        buf.put(values(base + 2).toByte) // B
        buf.put(values(base + 1).toByte) // G
        buf.put(values(base).toByte)     // R
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      fy += 1
    }
    buf.array()
  }

  /** Parse a 24-bit uncompressed BMP back to logical RGB values. */
  def decodeBmp(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= BmpHeaderSize, s"BMP truncated: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "not a BMP: bad magic")
    buf.getInt(); buf.getInt()
    val dataOffset = buf.getInt()
    val infoSize = buf.getInt()
    require(infoSize >= 40, s"unsupported BMP info header size $infoSize")
    val width = buf.getInt()
    val height = buf.getInt()
    require(width > 0 && height > 0, s"unsupported BMP dims ${width}x$height")
    buf.getShort()
    val bpp = buf.getShort()
    require(bpp == 24, s"unsupported BMP bpp $bpp (only 24-bit)")
    require(buf.getInt() == 0, "unsupported BMP compression")
    // bounds math in Long: a crafted header with huge dims would
    // overflow Int, turn the bound negative, and pass — then fail later
    // with an uncontrolled allocation/index error instead of this
    // require. The offset must also sit past the header, or header
    // bytes would silently decode as pixels.
    require(dataOffset >= BmpHeaderSize,
      s"BMP data offset $dataOffset inside the $BmpHeaderSize-byte header")
    val stride = (width.toLong * 3 + 3) & ~3L // NOT bmpRowStride: Int math overflows first
    val needed = dataOffset + stride * height
    require(bytes.length >= needed,
      s"BMP pixel data truncated: ${bytes.length} < $needed")
    val strideI = stride.toInt // bound check passed: all offsets fit in Int
    val values = new Array[Int](width * height * 3)
    var fy = 0
    while (fy < height) {
      val y = height - 1 - fy
      val rowOff = dataOffset + fy * strideI
      var x = 0
      while (x < width) {
        val base = (y * width + x) * 3
        val p = rowOff + x * 3
        values(base + 2) = bytes(p) & 0xff     // B
        values(base + 1) = bytes(p + 1) & 0xff // G
        values(base) = bytes(p + 2) & 0xff     // R
        x += 1
      }
      fy += 1
    }
    Decoded("bmp", values, width, height, sampleRateHz = 0)
  }

  /** Encode PCM16 mono samples (each in [-32768, 32767]) as a WAV. */
  def encodeWav(samples: Array[Int], sampleRateHz: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                    // PCM fmt chunk size
    buf.putShort(1)                   // PCM
    buf.putShort(1)                   // mono
    buf.putInt(sampleRateHz)
    buf.putInt(sampleRateHz * 2)      // byte rate
    buf.putShort(2)                   // block align
    buf.putShort(16)                  // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i).toShort); i += 1 }
    buf.array()
  }

  /** Parse a PCM16 mono WAV, walking RIFF chunks (unknown chunks are
    * skipped, as a real reader must — fmt need not be adjacent to data).
    */
  def decodeWav(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 12, s"WAV truncated: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    buf.get(magic)
    require(new String(magic, "US-ASCII") == "RIFF", "not a WAV: bad RIFF magic")
    buf.getInt()
    buf.get(magic)
    require(new String(magic, "US-ASCII") == "WAVE", "not a WAV: bad WAVE tag")
    var sampleRate = -1
    var samples: Array[Int] = null
    while (buf.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
      buf.get(magic)
      val tag = new String(magic, "US-ASCII")
      val size = buf.getInt()
      require(size >= 0 && buf.remaining() >= size, s"WAV chunk '$tag' truncated")
      tag match {
        case "fmt " =>
          val start = buf.position()
          require(buf.getShort() == 1, "unsupported WAV format (only PCM)")
          require(buf.getShort() == 1, "unsupported WAV channels (only mono)")
          sampleRate = buf.getInt()
          buf.getInt(); buf.getShort()
          require(buf.getShort() == 16, "unsupported WAV bit depth (only 16)")
          buf.position(start + size + (size & 1)) // chunks are word-aligned
        case "data" =>
          samples = new Array[Int](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort().toInt; i += 1 }
          buf.position(buf.position() + (size & 1))
        case _ =>
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(sampleRate >= 0, "WAV missing fmt chunk")
    require(samples != null, "WAV missing data chunk")
    Decoded("wav", samples, width = 0, height = 0, sampleRateHz = sampleRate)
  }

  /** Sniff the magic bytes and dispatch — the entry point the decode
    * pipeline uses on the opaque binary column.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 4, s"payload too short to sniff: ${bytes.length} bytes")
    if (bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) decodeBmp(bytes)
    else if (bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte &&
      bytes(2) == 'F'.toByte && bytes(3) == 'F'.toByte) decodeWav(bytes)
    else throw new IllegalArgumentException("unrecognized payload magic")
  }
}
