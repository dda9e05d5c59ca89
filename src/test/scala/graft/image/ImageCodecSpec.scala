package graft.image

import org.scalatest.funsuite.AnyFunSuite

import graft.image.ImageCodec._

class ImageCodecSpec extends AnyFunSuite {

  private def quantize(v: Float): Float = math.round(v * 255f) / 255f

  test("P6 encode/decode roundtrip is exact at maxval 255") {
    val w = 7; val h = 5
    val px = Array.tabulate(w * h * 3)(i => quantize((i % 97) / 96f))
    val img = Image(w, h, 3, px)
    val rt = decode(encode(img))
    assert(rt.width == w && rt.height == h && rt.channels == 3)
    assert(rt.pixels.toSeq == px.toSeq)
  }

  test("P5 grayscale + header comments + 16-bit raster decode") {
    val rt = decode(encode(Image(3, 2, 1, Array(0f, 0.5f, 1f, 0.25f, 0.75f, 0f).map(quantize))))
    assert(rt.channels == 1 && rt.width == 3 && rt.height == 2)
    // comments between header tokens are legal netpbm
    val withComment = ("P5\n# a comment\n2 1\n# another\n255\n"
      .getBytes("US-ASCII").toSeq ++ Seq(0.toByte, 255.toByte)).toArray
    val c = decode(withComment)
    assert(c.width == 2 && c.height == 1 && c.pixels.toSeq == Seq(0f, 1f))
    // 16-bit big-endian raster, maxval 65535
    val wide = ("P5\n1 1\n65535\n".getBytes("US-ASCII").toSeq ++
      Seq(0x80.toByte, 0x00.toByte)).toArray
    assert(math.abs(decode(wide).pixels(0) - 0x8000 / 65535f) < 1e-6)
  }

  test("decode rejects malformed payloads loudly") {
    intercept[IllegalArgumentException](decode("P4\n1 1\n".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](decode("P6\n2 2\n255\n".getBytes("US-ASCII")))
    intercept[Exception](decode(Array[Byte](1, 2, 3)))
    assert(magicOf("P6\nx".getBytes("US-ASCII")).contains("P6"))
    assert(magicOf(Array[Byte](-1, -40)).isEmpty) // JPEG SOI -> stub path
  }

  test("BT.601 luma and bilinear resize behave like the reference ops") {
    // constant image stays constant under luma + any resize
    val const = Image(10, 6, 3, Array.fill(10 * 6 * 3)(0.4f))
    val thumb = resizeBilinear(toLuma(const), 4, 3)
    assert(thumb.pixels.forall(p => math.abs(p - 0.4f) < 1e-6))
    // 2x2 checkerboard downsampled to 1x1 = the mean (half-pixel centers)
    val checker = Image(2, 2, 1, Array(0f, 1f, 1f, 0f))
    assert(math.abs(resizeBilinear(checker, 1, 1).pixels(0) - 0.5f) < 1e-6)
    // luma of pure red/green/blue = the BT.601 weights
    val rgb = Image(3, 1, 3, Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f, 1f))
    val l = toLuma(rgb).pixels
    assert(math.abs(l(0) - 0.299f) < 1e-6 && math.abs(l(1) - 0.587f) < 1e-6 &&
      math.abs(l(2) - 0.114f) < 1e-6)
    // upscale preserves range and corners' neighborhoods
    val up = resizeBilinear(checker, 4, 4)
    assert(up.pixels.forall(p => p >= 0f && p <= 1f))
    assert(up.pixels(0) == 0f && up.pixels(3) == 1f) // corner samples clamp to source corners
  }

  test("fused lumaMean equals the decode->luma->mean path exactly") {
    for (seed <- 1 to 5) {
      val px = Array.tabulate(16 * 9 * 3)(i => quantize(((i * seed) % 101) / 100f))
      val bytes = encode(Image(16, 9, 3, px))
      // fused accumulates in double, the decode path in float luma
      // weights — agree to float precision
      val viaDecode = toLuma(decode(bytes)).pixels.map(_.toDouble).sum / (16 * 9)
      assert(math.abs(lumaMean(bytes) - viaDecode) < 1e-6,
        s"seed=$seed fused=${lumaMean(bytes)} ref=$viaDecode")
    }
    // grayscale P5 path too
    val g = encode(Image(4, 4, 1, Array.tabulate(16)(i => quantize(i / 15f))))
    val ref = decode(g).pixels.map(_.toDouble).sum / 16
    assert(math.abs(lumaMean(g) - ref) < 1e-6)
  }

  test("histogram is normalized and places mass in the right buckets") {
    val g = Image(4, 1, 1, Array(0.05f, 0.05f, 0.55f, 0.95f))
    val hist = histogram(g, 10)
    assert(math.abs(hist.sum - 1f) < 1e-6)
    assert(math.abs(hist(0) - 0.5f) < 1e-6)
    assert(math.abs(hist(5) - 0.25f) < 1e-6)
    assert(math.abs(hist(9) - 0.25f) < 1e-6)
  }
}
