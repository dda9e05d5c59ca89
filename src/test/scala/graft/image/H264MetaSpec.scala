package graft.image

import org.scalatest.funsuite.AnyFunSuite

/** The library-free H.264 SPS metadata walk. The fixture encoder
  * (SpsWriter) writes the same §7.3.2.1.1 syntax in spec order, so these
  * tests exercise every parser path — Baseline and High profile
  * branches, Exp-Golomb values spanning multiple prefix lengths, frame
  * cropping for non-multiple-of-16 dimensions, emulation-prevention
  * round-trip — across a dimension grid. A reader/writer pair authored
  * against the same spec can in principle share a mirrored
  * misunderstanding; the hand-checked golden bitstream test pins the
  * writer to the spec byte-for-byte so the pair can't drift together. */
class H264MetaSpec extends AnyFunSuite {

  test("SPS walk recovers planted profile/level/dims across a grid (incl. crop)") {
    for {
      (w, h) <- Seq((160, 90), (320, 240), (1920, 1080), (1280, 720),
        (178, 98), (354, 174), (16, 16), (3840, 2160))
      profile <- Seq(66, 77, 100)
      level <- Seq(30, 41)
    } {
      val stream = SpsWriter.annexB(profile, level, w, h)
      val m = H264Meta.parse(stream).getOrElse(
        fail(s"parse failed: profile=$profile ${w}x$h"))
      assert(m.width == w && m.height == h,
        s"profile=$profile: got ${m.width}x${m.height}, planted ${w}x$h")
      assert(m.profileIdc == profile && m.levelIdc == level)
      assert(m.bitDepth == 8 && !m.interlaced)
    }
  }

  test("golden bitstream: Baseline 1920x1080 SPS bytes are spec-exact") {
    // Hand-derived from §7.3.2.1.1 for profile 66, level 40, 1920x1088
    // coded size with 8-line bottom crop:
    //   u(8)=66, u(8)=0, u(8)=40, ue(0)=1, ue(0)=1, ue(0)=1, ue(0)=1,
    //   ue(1)=010, u(1)=0, ue(119)=0000001111000, ue(67)=0000001000100,
    //   u(1)=1, u(1)=1, u(1)=1 (crop), ue(0)=1, ue(0)=1, ue(0)=1,
    //   ue(4)=00101, u(1)=0 (vui), stop=1, pad to byte.
    // Bit string: 01000010 00000000 00101000 11110100 00000011
    //             11000000 00010001 00111111 00101010 0 + stop 1 + pad
    val sps = SpsWriter.annexB(66, 40, 1920, 1080)
    // NAL layout: 00 00 00 01 67 <9-byte sps rbsp> 00 00 00 01 68 ...
    assert(sps.take(5).toSeq == Seq[Byte](0, 0, 0, 1, 0x67))
    val expected = Array(
      "01000010", "00000000", "00101000", "11110100", "00000011",
      "11000000", "00010001", "00111111", "00101010"
    ).map(s => Integer.parseInt(s, 2).toByte)
    val body = sps.slice(5, 5 + expected.length)
    assert(body.toSeq == expected.toSeq,
      s"writer bitstream drifted from the spec derivation:\n" +
        s"got  ${body.map(b => f"${b & 0xFF}%02x").mkString(" ")}\n" +
        s"want ${expected.map(b => f"${b & 0xFF}%02x").mkString(" ")}")
    // and the next start code follows immediately
    assert(sps.slice(5 + expected.length, 5 + expected.length + 4).toSeq ==
      Seq[Byte](0, 0, 0, 1))
  }

  test("emulation prevention: writer inserts 03, reader strips it") {
    val raw = Array[Byte](0x42, 0, 0, 0, 1, 0, 0, 2, 0x7F, 0, 0, 3, 9)
    val escaped = SpsWriter.emulationPrevent(raw)
    assert(escaped.toSeq == Seq[Byte](
      0x42, 0, 0, 3, 0, 1, 0, 0, 3, 2, 0x7F, 0, 0, 3, 3, 9))
    assert(H264Meta.toRbsp(escaped, 0, escaped.length).toSeq == raw.toSeq)
  }

  test("bare SPS NAL (no start code) parses; malformed inputs return None") {
    val annexB = SpsWriter.annexB(100, 31, 640, 360)
    // SPS NAL = from the header byte to the next 00 00 00 01 start code
    // (the RBSP itself contains zero bytes, so no takeWhile shortcut)
    val rest = annexB.drop(4)
    val end = (1 until rest.length - 3).find(i =>
      rest(i) == 0 && rest(i + 1) == 0 && rest(i + 2) == 0 && rest(i + 3) == 1).get
    val spsNal = rest.take(end)
    assert(H264Meta.parse(spsNal).exists(m => m.width == 640 && m.height == 360))
    val bad: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      Array[Byte](0, 0, 0, 1), // start code, no NAL
      Array[Byte](0, 0, 0, 1, 0x65.toByte, 1, 2, 3), // slice, no SPS
      annexB.take(9), // truncated inside the SPS
      Array.fill(64)(0x42.toByte))
    bad.foreach(b => assert(H264Meta.parse(b).isEmpty))
  }

  test("video_meta dispatches y4m and h264; MixedVideoGen planting recovered") {
    for (idx <- 0L until 44L) {
      val row = graft.fixtures.MixedVideoGen.videoRow(idx)
      val w = 160 + (idx % 11) * 18
      val h = 90 + (idx % 7) * 14
      if (idx % 2 == 0) {
        assert(Y4mCodec.isY4m(row.bytes))
        val m = Y4mCodec.parseMeta(row.bytes)
        assert(m.width == w && m.height == h)
      } else {
        val m = H264Meta.parse(row.bytes).getOrElse(fail(s"idx $idx"))
        assert(m.width == w && m.height == h, s"idx $idx: $m vs ${w}x$h")
        assert(m.profileIdc == (if (idx % 4 == 1) 66 else 100))
        assert(m.levelIdc == 30 + (idx % 3) * 10)
      }
    }
  }
}
