package graft.image

import org.scalatest.funsuite.AnyFunSuite

import graft.image.Y4mCodec._

class Y4mCodecSpec extends AnyFunSuite {

  private def quantize(v: Float): Float = math.round(v * 255f) / 255f
  private def frame(fill: Float): Array[Float] = Array.fill(8 * 6)(quantize(fill))

  test("encode/parse roundtrip: meta, frame count, exact luma recovery") {
    val frames = Seq(frame(0.2f), frame(0.5f), frame(0.8f))
    val bytes = encode(8, 6, frames)
    assert(isY4m(bytes))
    val meta = parseMeta(bytes)
    assert(meta.width == 8 && meta.height == 6 && meta.nFrames == 3)
    // C420 chroma plane accounted: 8*6 luma + 2*(4*3) chroma
    assert(meta.frameSize == 48 + 24)
    for (i <- frames.indices) {
      val img = frameLuma(bytes, i)
      assert(img.width == 8 && img.height == 6 && img.channels == 1)
      assert(img.pixels.toSeq == frames(i).toSeq)
    }
    intercept[IllegalArgumentException](frameLuma(bytes, 3))
  }

  test("motionStats: static = zero delta, alternating = large, means exact") {
    val static = encode(8, 6, Seq.fill(4)(frame(0.4f)))
    val Array(n1, mean1, d1) = motionStats(static)
    assert(n1 == 4.0 && math.abs(mean1 - quantize(0.4f)) < 1e-6 && d1 == 0.0)

    val toggling = encode(8, 6, Seq(frame(0.1f), frame(0.9f), frame(0.1f), frame(0.9f)))
    val Array(_, mean2, d2) = motionStats(toggling)
    assert(math.abs(mean2 - 0.5) < 0.01)
    assert(d2 > 0.75 && d2 <= 0.81, s"delta $d2") // |0.9-0.1| per step

    val single = encode(8, 6, Seq(frame(0.3f)))
    assert(motionStats(single)(2) == 0.0) // one frame -> no delta
  }

  test("sampleFrameMeans honors the stride") {
    val bytes = encode(8, 6,
      (0 until 8).map(f => frame(quantize(0.1f * (f + 1)))))
    val means = sampleFrameMeans(bytes, 3) // frames 0, 3, 6
    assert(means.length == 3)
    assert(math.abs(means(0) - quantize(0.1f)) < 1e-4)
    assert(math.abs(means(1) - quantize(0.4f)) < 1e-4)
    assert(math.abs(means(2) - quantize(0.7f)) < 1e-4)
  }

  test("temporalDhash: twins within 3 bits, organic videos >= 12 apart (v3 margins)") {
    import graft.fixtures.VideoGen
    // planted trimmed+remapped twins: the v3 oracle's recall margin
    val twinIdx = (0L until 400L).filter(_ % 20 == 6)
    assert(twinIdx.size == 20)
    twinIdx.foreach { i =>
      val a = temporalDhash(VideoGen.videoRow(i).bytes, 1)
      val b = temporalDhash(VideoGen.twinRow(i).bytes, 1)
      val d = java.lang.Long.bitCount(a ^ b)
      assert(d <= 3, s"twin $i drifted $d bits")
    }
    // organic separation: the v3 oracle's precision margin (pairwise over
    // a 60-video sample, all planting classes included)
    val sigs = (0L until 60L).map(i => temporalDhash(VideoGen.videoRow(i).bytes, 1))
    for (i <- sigs.indices; j <- (i + 1) until sigs.size) {
      val d = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
      assert(d >= 12, s"organic videos $i/$j only $d bits apart")
    }
    // majority vote is frame-order/set robust: stride sampling agrees
    val full = temporalDhash(VideoGen.videoRow(6L).bytes, 1)
    val strided = temporalDhash(VideoGen.videoRow(6L).bytes, 3)
    assert(java.lang.Long.bitCount(full ^ strided) <= 3)
    // non-y4m payloads -> null in the expression layer
    assert(temporalDhashOrNull("P6\n1 1\n255\n".getBytes("US-ASCII"), 1) == null)
  }

  test("malformed streams are rejected loudly") {
    assert(!isY4m("P6\n1 1\n255\n".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](parseMeta(Array[Byte](1, 2, 3)))
    // unsupported colorspace
    val c411 = ("YUV4MPEG2 W4 H4 F25:1 C411\nFRAME\n".getBytes("US-ASCII").toSeq ++
      Seq.fill(24)(0.toByte)).toArray
    intercept[IllegalArgumentException](parseMeta(c411))
    // truncated frame payload
    val good = encode(8, 6, Seq(frame(0.5f)))
    intercept[IllegalArgumentException](
      parseMeta(java.util.Arrays.copyOf(good, good.length - 10)))
    // hostile dims must not overflow the frame-size math
    val huge = ("YUV4MPEG2 W16385 H16385 F25:1 C420\n").getBytes("US-ASCII")
    intercept[IllegalArgumentException](parseMeta(huge))
  }
}
