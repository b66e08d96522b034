package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The codec is the correctness core of m01: encode→decode must be the
  * identity on logical values for every shape, including the BMP row
  * padding (width % 4 != 0) and WAV odd-chunk alignment edge cases, and
  * corrupt payloads must fail loudly rather than decode garbage.
  * Deterministic exhaustive sweeps over the shape space (same style as
  * PropertySpec: fixed seeds beat random flakes in a gate).
  */
class MediaCodecSpec extends AnyFunSuite {

  test("BMP round-trips logical RGB values for all widths incl. padded strides") {
    // widths 1..9 cover all stride paddings (w*3 mod 4 = 0..3)
    for (w <- 1 to 9; h <- 1 to 6; seed <- Seq(0L, 17L, 4242L)) {
      val px = Array.tabulate(w * h * 3)(i => ((seed + i * 7) % 256).toInt)
      val d = MediaCodec.decodeBmp(MediaCodec.encodeBmp(px, w, h))
      assert(d.width === w && d.height === h && d.kind === "bmp")
      assert(d.values.toSeq === px.toSeq, s"w=$w h=$h seed=$seed")
    }
  }

  test("WAV round-trips PCM16 samples incl. odd lengths and full range") {
    for (n <- Seq(0, 1, 2, 3, 17, 256, 257, 599); seed <- Seq(0L, 31L, 999L)) {
      val sm = Array.tabulate(n)(i => ((seed + i * 17) % 65536).toInt - 32768)
      val d = MediaCodec.decodeWav(MediaCodec.encodeWav(sm, 16000))
      assert(d.sampleRateHz === 16000 && d.kind === "wav")
      assert(d.values.toSeq === sm.toSeq, s"n=$n seed=$seed")
    }
  }

  test("WAV extremes survive: -32768 and 32767") {
    val sm = Array(-32768, 32767, 0, -1, 1)
    assert(MediaCodec.decodeWav(MediaCodec.encodeWav(sm, 8000)).values.toSeq === sm.toSeq)
  }

  test("decode dispatches on magic and rejects garbage") {
    val bmp = MediaCodec.encodeBmp(Array.fill(3 * 2 * 3)(5), 3, 2)
    val wav = MediaCodec.encodeWav(Array(1, 2, 3), 16000)
    assert(MediaCodec.decode(bmp).kind === "bmp")
    assert(MediaCodec.decode(wav).kind === "wav")
    intercept[IllegalArgumentException](MediaCodec.decode(Array[Byte](1, 2, 3, 4, 5)))
    intercept[IllegalArgumentException](MediaCodec.decode(Array[Byte]()))
  }

  test("truncated payloads fail loudly, not silently") {
    val bmp = MediaCodec.encodeBmp(Array.fill(4 * 4 * 3)(9), 4, 4)
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(bmp.take(bmp.length - 5)))
    val wav = MediaCodec.encodeWav(Array.fill(10)(7), 16000)
    intercept[IllegalArgumentException](MediaCodec.decodeWav(wav.take(20)))
  }

  test("crafted BMP headers fail the bound check, not with overflow/index errors") {
    def patchInt(bytes: Array[Byte], off: Int, v: Int): Array[Byte] = {
      val b = bytes.clone()
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(off, v)
      b
    }
    val bmp = MediaCodec.encodeBmp(Array.fill(4 * 4 * 3)(9), 4, 4)
    // huge dims: Int bound math would overflow negative and pass the
    // require, then die on array allocation — must be the require instead
    val hugeW = patchInt(bmp, 18, 0x40000000)
    val exW = intercept[IllegalArgumentException](MediaCodec.decodeBmp(hugeW))
    assert(exW.getMessage.contains("truncated"))
    val hugeBoth = patchInt(patchInt(bmp, 18, 0x100000), 22, 0x100000)
    val exB = intercept[IllegalArgumentException](MediaCodec.decodeBmp(hugeBoth))
    assert(exB.getMessage.contains("truncated"))
    // data offset pointing inside the header: header bytes must not
    // silently decode as pixels
    val inHeader = patchInt(bmp, 10, 4)
    val exO = intercept[IllegalArgumentException](MediaCodec.decodeBmp(inHeader))
    assert(exO.getMessage.contains("header"))
  }

  test("WAV chunk walk skips unknown chunks before fmt/data") {
    // splice a LIST chunk between WAVE and fmt — a real reader must skip it
    val base = MediaCodec.encodeWav(Array(11, -22, 33), 16000)
    val extra = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 1, 2, 3, 4)
    val spliced = base.take(12) ++ extra ++ base.drop(12)
    // fix the RIFF size field (bytes 4..7, LE)
    val sz = spliced.length - 8
    for (b <- 0 until 4) spliced(4 + b) = ((sz >> (8 * b)) & 0xff).toByte
    val d = MediaCodec.decodeWav(spliced)
    assert(d.values.toSeq === Seq(11, -22, 33))
  }

  test("BMP decoder undoes bottom-up BGR storage (order-exact, not just set-equal)") {
    // distinct value per position: any row/byte-order slip would permute
    val w = 5; val h = 3
    val px = Array.tabulate(w * h * 3)(i => (i * 11) % 256)
    assert(MediaCodec.decodeBmp(MediaCodec.encodeBmp(px, w, h)).values.toSeq === px.toSeq)
    // and the file really is bottom-up BGR: first stored pixel byte is
    // the BLUE byte of the BOTTOM-LEFT logical pixel
    val bytes = MediaCodec.encodeBmp(px, w, h)
    val bottomLeftBlue = px(((h - 1) * w + 0) * 3 + 2)
    assert((bytes(54) & 0xff) === bottomLeftBlue)
  }
}
