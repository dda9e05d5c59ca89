package graft.audio

import org.scalatest.funsuite.AnyFunSuite

class AudioCodecSpec extends AnyFunSuite {

  test("pcm16 roundtrip is near-lossless") {
    val sig = AudioSynth.synth(42L, 16000, 16000)
    val rt = AudioCodec.decode(AudioCodec.encode(sig, "pcm16"), "pcm16")
    assert(AudioCodec.snrDb(sig, rt) > 80.0)
  }

  test("ulaw and alaw roundtrip meet the SNR >= 30 dB invariant") {
    for (codec <- Seq("ulaw", "alaw"); seed <- 0L until 20L) {
      val sig = AudioSynth.synth(AudioSynth.mix64(seed), 8000, 8000)
      val rt = AudioCodec.decode(AudioCodec.encode(sig, codec), codec)
      val snr = AudioCodec.snrDb(sig, rt)
      assert(snr >= 30.0, s"codec=$codec seed=$seed snr=$snr")
    }
  }

  test("companding roundtrip is sample-bounded for arbitrary floats") {
    val rnd = new java.util.Random(42)
    for (_ <- 0 until 200) {
      val sig = Array.fill(64)((rnd.nextFloat() * 1.999f) - 1.0f)
      for (codec <- AudioCodec.Codecs) {
        val rt = AudioCodec.decode(AudioCodec.encode(sig, codec), codec)
        assert(rt.length == sig.length)
        // G.711 max quantization error is bounded; generous envelope here
        sig.zip(rt).foreach { case (a, b) => assert(math.abs(a - b) < 0.07, s"$codec $a $b") }
      }
    }
  }

  test("decode is deterministic and encode sizes are exact") {
    val sig = AudioSynth.synth(7L, 8000, 1234)
    assert(AudioCodec.encode(sig, "pcm16").length == 2468)
    assert(AudioCodec.encode(sig, "ulaw").length == 1234)
    assert(AudioCodec.encode(sig, "alaw").length == 1234)
    assert(AudioSynth.synth(7L, 8000, 1234).toSeq == sig.toSeq)
  }

  test("band energies: a pure sine lands in its Goertzel band") {
    val sr = 8000
    val n = 8000
    // band centers at (b+0.5)*sr/16: band 1 -> 750 Hz, band 6 -> 3250 Hz
    for ((freq, band) <- Seq((750.0, 1), (3250.0, 6))) {
      val sig = Array.tabulate(n)(i =>
        (0.5 * math.sin(2 * math.Pi * freq * i / sr)).toFloat)
      val e = AudioCodec.bandEnergies(AudioCodec.encode(sig, "pcm16"), "pcm16", sr)
      val top = e.zipWithIndex.maxBy(_._1)._2
      assert(top == band, s"freq=$freq => band $top, expected $band: ${e.mkString(",")}")
    }
  }

  test("band energies deterministic across codecs (same signal shape)") {
    val sig = AudioSynth.synth(3L, 8000, 4000)
    val p = AudioCodec.bandEnergies(AudioCodec.encode(sig, "pcm16"), "pcm16", 8000)
    val u = AudioCodec.bandEnergies(AudioCodec.encode(sig, "ulaw"), "ulaw", 8000)
    p.zip(u).foreach { case (a, b) =>
      assert(math.abs(a - b) <= math.max(1e-6, 0.1 * math.max(a, b)), s"$a vs $b")
    }
  }

  test("ulaw/alaw byte-level involution sanity") {
    for (s <- Seq[Short](0, 1, -1, 100, -100, 1000, -1000, 32767, -32768)) {
      val u = AudioCodec.ulawToLinear(AudioCodec.linearToUlaw(s))
      val a = AudioCodec.alawToLinear(AudioCodec.linearToAlaw(s))
      assert(math.abs(u - s) <= math.max(64, math.abs(s) / 8), s"ulaw $s -> $u")
      assert(math.abs(a - s) <= math.max(64, math.abs(s) / 8), s"alaw $s -> $a")
    }
  }
}
