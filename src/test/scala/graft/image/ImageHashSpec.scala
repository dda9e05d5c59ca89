package graft.image

import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.NearDupImageGen

/** The perceptual dHash and the margins that make the i4 oracle safe:
  * cross-format twins (same pixels, different codec, JPEG loss included)
  * must land within the query threshold while organic pairs stay an
  * order of magnitude away — measured over the REAL fixture generator at
  * above-verify scale, not assumed. */
class ImageHashSpec extends AnyFunSuite {

  private val N = 600L // covers the sf0.01 verify scale (560 rows)

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private lazy val baseHashes: Map[Long, Long] =
    (0L until N).map(i => i -> ImageHash.dhash(NearDupImageGen.baseRow(i).bytes)).toMap

  test("dhash is deterministic and format-independent for lossless re-encodes") {
    val px = ImageCodec.Image(96, 72, 1,
      Array.tabulate(96 * 72)(i => 0.5f + 0.4f * math.sin(i * 0.05).toFloat))
    val viaPgm = ImageHash.dhash(ImageCodec.encode(px))
    val viaPng = ImageHash.dhash(JdkImageCodec.encode(px, "png"))
    val viaBmp = ImageHash.dhash(JdkImageCodec.encode(px, "bmp"))
    // PNG/BMP are lossless over the same 8-bit quantization
    assert(viaPgm == viaPng && viaPng == viaBmp)
  }

  test("planted cross-format twins sit within hamming 8 (with margin)") {
    val twinDistances = (0L until N).filter(_ % 10 == 7).map { i =>
      hamming(baseHashes(i), ImageHash.dhash(NearDupImageGen.twinRow(i).bytes))
    }
    assert(twinDistances.nonEmpty)
    val worst = twinDistances.max
    assert(worst <= 6, s"worst twin hamming $worst — threshold 8 has no margin")
  }

  test("organic pairs stay far outside the threshold at verify scale") {
    val hs = baseHashes.values.toArray
    var minH = 64
    for (i <- hs.indices; j <- (i + 1) until hs.length)
      minH = math.min(minH, hamming(hs(i), hs(j)))
    // deterministic fixture: measured 12 at N=600 (twins sit <= 6, the
    // query threshold is 8 — strictly between the two populations)
    assert(minH > 10, s"closest organic pair at hamming $minH — too close to the 8 threshold")
  }

  test("undecodable payloads evaluate to SQL null, not a job failure") {
    assert(ImageHash.dhashOrNull("not an image".getBytes) == null)
    assert(ImageHash.dhashOrNull(Array.empty[Byte]) == null)
    // truncated JPEG
    val jpg = JdkImageCodec.encode(ImageCodec.Image(16, 16, 1,
      Array.fill(256)(0.5f)), "jpg")
    assert(ImageHash.dhashOrNull(jpg.take(jpg.length / 3)) == null)
  }
}
