package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** Pins the exact contract of AudioCodec.segmentsMs (the `pcm_segments`
  * kernel): frame-grid voicedness, run merging, partial-tail drop, codec
  * silence values, and threshold edges — the properties the c18 oracle's
  * integer arithmetic presumes. */
class SegmentsSpec extends AnyFunSuite {

  private val Sr = 8000
  private val FrameMs = 50
  private val Fs = Sr * FrameMs / 1000 // 400 samples per frame
  private val Thr = 0.03

  private def tone(nSamples: Int, amp: Float = 0.5f): Array[Float] = {
    val w = 2.0 * math.Pi * 440.0 / Sr
    Array.tabulate(nSamples)(i => (amp * math.sin(w * i)).toFloat)
  }
  private def silence(nSamples: Int): Array[Float] = new Array[Float](nSamples)

  private def segs(sig: Array[Float], codec: String): Seq[(Int, Int)] = {
    val flat = AudioCodec.segmentsMs(AudioCodec.encode(sig, codec), codec,
      Sr, FrameMs, Thr)
    flat.grouped(2).map(a => (a(0), a(1))).toSeq
  }

  test("voiced-throughout signal is one segment over its full frames") {
    for (codec <- AudioCodec.Codecs) {
      assert(segs(tone(Fs * 7), codec) == Seq((0, 350)), codec)
    }
  }

  test("trailing partial frame is dropped, not padded") {
    // 7 full frames + 399 samples of tail -> still ends at 350 ms
    assert(segs(tone(Fs * 7 + Fs - 1), "pcm16") == Seq((0, 350)))
    // shorter than one frame -> no segments at all
    assert(segs(tone(Fs - 1), "pcm16").isEmpty)
  }

  test("sil|voice|sil|voice layout yields exactly the two planted runs") {
    for (codec <- AudioCodec.Codecs) {
      val sig = silence(Fs * 2) ++ tone(Fs * 3) ++ silence(Fs * 4) ++ tone(Fs * 2)
      assert(segs(sig, codec) == Seq((100, 250), (450, 550)), codec)
    }
  }

  test("leading/only silence yields no segments; trailing run closes at nf") {
    assert(segs(silence(Fs * 5), "pcm16").isEmpty)
    assert(segs(silence(Fs * 2) ++ tone(Fs * 2), "pcm16") == Seq((100, 200)))
  }

  test("G.711 companded zero decodes far below the threshold") {
    // the c18 in-query silence is repeat(encode(0)); its decoded RMS must
    // be decisively unvoiced for both companded codecs
    for (codec <- Seq(AudioCodec.Ulaw, AudioCodec.Alaw)) {
      val z = AudioCodec.encode(Array(0f), codec).head
      val r = AudioCodec.rms(Array.fill(Fs)(z), codec)
      assert(r < Thr / 10, s"$codec companded-zero rms=$r")
    }
  }

  test("threshold is a frame-RMS >= comparison on float scale") {
    // sine amplitude a has RMS a/sqrt(2); straddle the 0.03 threshold
    val loud = tone(Fs, amp = (Thr * math.sqrt(2.0) * 1.1).toFloat)
    val quiet = tone(Fs, amp = (Thr * math.sqrt(2.0) * 0.9).toFloat)
    assert(segs(loud, "pcm16") == Seq((0, 50)))
    assert(segs(quiet, "pcm16").isEmpty)
  }

  test("stripSilence splices exactly the voiced frames' bytes; idempotent") {
    for (codec <- AudioCodec.Codecs) {
      val voiced1 = tone(Fs * 3)
      val voiced2 = tone(Fs * 2, amp = 0.4f)
      // trailing half-frame of silence exercises the tail drop too
      val sig = silence(Fs * 2) ++ voiced1 ++ silence(Fs) ++ voiced2 ++
        silence(Fs / 2)
      val enc = AudioCodec.encode(sig, codec)
      val stripped = AudioCodec.stripSilence(enc, codec, Sr, FrameMs, Thr)
      // encoding is per-sample stateless, so splicing encoded voiced
      // frames equals encoding the spliced signal
      val expect = AudioCodec.encode(voiced1 ++ voiced2, codec)
      assert(stripped.sameElements(expect), codec)
      val again = AudioCodec.stripSilence(stripped, codec, Sr, FrameMs, Thr)
      assert(again.sameElements(stripped), codec)
    }
  }

  test("unknown codec fails loudly like decode does") {
    intercept[IllegalArgumentException] {
      AudioCodec.segmentsMs(Array[Byte](1, 2), "mp3", Sr, FrameMs, Thr)
    }
  }
}
