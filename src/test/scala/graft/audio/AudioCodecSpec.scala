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

  test("resample: exact length contract; tone fidelity >= 30 dB; anti-aliased") {
    // length contract: floor(n * dst / src), every codec, up and down
    for ((src, dst) <- Seq((8000, 16000), (44100, 16000), (16000, 16000),
                           (16000, 8000));
         codec <- AudioCodec.Codecs) {
      val sig = AudioSynth.synth(AudioSynth.mix64(5L), src, 4321)
      val out = AudioCodec.resample(AudioCodec.encode(sig, codec), codec, src, dst)
      assert(AudioCodec.sampleCount(out.length, "pcm16") ==
        AudioCodec.resampledCount(4321, src, dst), s"$codec $src->$dst")
    }
    // fidelity: a pure tone resampled must match the analytically
    // synthesized tone at the target rate (north-rule allclose bar),
    // interior samples (the windowed-sinc support tapers at the edges)
    for ((src, dst) <- Seq((8000, 16000), (44100, 16000), (16000, 8000))) {
      val f = 440.0
      val tone = Array.tabulate(src)(i =>
        (0.5 * math.sin(2 * math.Pi * f * i / src)).toFloat)
      val out = AudioCodec.decode(
        AudioCodec.resample(AudioCodec.encode(tone, "pcm16"), "pcm16", src, dst),
        "pcm16")
      val ref = Array.tabulate(out.length)(m =>
        (0.5 * math.sin(2 * math.Pi * f * m / dst)).toFloat)
      val skip = math.ceil(8.0 / math.min(1.0, dst.toDouble / src)).toInt + 2
      val snr = AudioCodec.snrDb(ref.slice(skip, ref.length - skip),
        out.slice(skip, out.length - skip))
      assert(snr >= 30.0, s"$src->$dst snr=$snr")
    }
    // anti-alias: content above the target Nyquist must be REMOVED, not
    // folded back into band (the failure mode of naive interpolation)
    val hi = Array.tabulate(44100)(i =>
      (0.5 * math.sin(2 * math.Pi * 15000.0 * i / 44100)).toFloat)
    val down = AudioCodec.decode(
      AudioCodec.resample(AudioCodec.encode(hi, "pcm16"), "pcm16", 44100, 8000),
      "pcm16")
    val interior = down.slice(60, down.length - 60)
    val rms = math.sqrt(interior.map(x => x.toDouble * x).sum / interior.length)
    assert(rms < 0.02, s"aliased energy survived downsampling: rms=$rms")
    // validation
    intercept[IllegalArgumentException](
      AudioCodec.resample(Array[Byte](0, 0), "pcm16", 0, 16000))
  }

  test("quality metrics separate organic, silent, and clipped clips") {
    for (codec <- AudioCodec.Codecs; seed <- 0L until 10L) {
      val sig = AudioSynth.synth(AudioSynth.mix64(seed), 8000, 8000)
      val organic = AudioCodec.encode(sig, codec)
      val Array(sil, clip, peak, rms) = AudioCodec.quality(organic, codec)
      // organic synth: peak <= 0.88, a tone mix is almost never at zero
      // and never at the rails
      assert(sil < 0.05, s"$codec seed=$seed organic silence=$sil")
      assert(clip == 0.0, s"$codec seed=$seed organic clipping=$clip")
      // synth peak <= 0.88 + companding quantization error
      assert(peak > 0.2 && peak <= 0.91, s"$codec peak=$peak")
      assert(rms > 0.05 && rms < peak, s"$codec rms=$rms peak=$peak")

      val silent = AudioCodec.gain(organic, codec, 0.0)
      val qs = AudioCodec.quality(silent, codec)
      assert(qs(0) == 1.0, s"$codec silent ratio=${qs(0)}")
      assert(qs(1) == 0.0 && qs(2) <= AudioCodec.SilenceLin / 32768.0)

      val clipped = AudioCodec.gain(organic, codec, 8.0)
      val qc = AudioCodec.quality(clipped, codec)
      assert(qc(1) > 0.3, s"$codec clipped ratio=${qc(1)}")
      assert(qc(0) < 0.05 && qc(2) > 0.97, s"$codec clipped peak=${qc(2)}")
    }
  }

  test("gain preserves sample count and scales rms linearly in range") {
    val sig = AudioSynth.synth(11L, 8000, 4000)
    for (codec <- AudioCodec.Codecs) {
      val bytes = AudioCodec.encode(sig, codec)
      val half = AudioCodec.gain(bytes, codec, 0.5)
      assert(AudioCodec.sampleCount(half.length, codec) ==
        AudioCodec.sampleCount(bytes.length, codec))
      val r0 = AudioCodec.quality(bytes, codec)(3)
      val r1 = AudioCodec.quality(half, codec)(3)
      // in-range gain (no clipping) halves the rms, up to companding error
      assert(math.abs(r1 / r0 - 0.5) < 0.02, s"$codec rms ratio=${r1 / r0}")
    }
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

  test("specialized filterbank loops are bit-identical to the naive kernel") {
    // Reference: the unspecialized per-sample-dispatch Goertzel loop the
    // production kernel replaced (same arithmetic order, no blocking).
    def naive(bytes: Array[Byte], codec: String, srHz: Int, nBands: Int): Array[Double] = {
      val n = AudioCodec.sampleCount(bytes.length, codec)
      val coeff = Array.tabulate(nBands) { b =>
        2.0 * math.cos(2.0 * math.Pi * ((b + 0.5) * srHz / (2.0 * nBands)) / srHz)
      }
      val s1 = new Array[Double](nBands); val s2 = new Array[Double](nBands)
      var i = 0
      while (i < n) {
        val x: Double = codec match {
          case "pcm16" => (((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort) / 32768.0
          case "ulaw"  => AudioCodec.ulawToLinear(bytes(i)) / 32768.0
          case "alaw"  => AudioCodec.alawToLinear(bytes(i)) / 32768.0
        }
        var b = 0
        while (b < nBands) {
          val s0 = x + coeff(b) * s1(b) - s2(b)
          s2(b) = s1(b); s1(b) = s0; b += 1
        }
        i += 1
      }
      Array.tabulate(nBands) { b =>
        val e = s1(b) * s1(b) + s2(b) * s2(b) - coeff(b) * s1(b) * s2(b)
        if (n == 0) 0.0 else e / (n.toDouble * n.toDouble)
      }
    }
    // odd + even sample counts exercise both the step2 main loop and the
    // single-sample tail of the pcm16 branch
    for (codec <- AudioCodec.Codecs; len <- Seq(0, 1, 2, 3, 1000, 1001); nb <- Seq(8, 32)) {
      val sig = AudioSynth.synth(AudioSynth.mix64(len.toLong * nb), 8000, len)
      val bytes = AudioCodec.encode(sig, codec)
      val fast = AudioCodec.bandEnergies(bytes, codec, 8000, nb)
      val slow = naive(bytes, codec, 8000, nb)
      assert(fast.length == slow.length)
      fast.zip(slow).zipWithIndex.foreach { case ((f, s), b) =>
        assert(java.lang.Double.doubleToRawLongBits(f) ==
          java.lang.Double.doubleToRawLongBits(s),
          s"codec=$codec len=$len nBands=$nb band=$b: $f != $s")
      }
    }
  }

  test("band-center tones: argmax == planted band with >= 90% concentration (c10 contract)") {
    // the c10 oracle's margin, pinned over the full (sr, band) grid at
    // several lengths (incl. a prime-ish n so no center aligns to an
    // exact DFT bin): an exactly-centered tone responds at ~A^2/4 in its
    // band and orders of magnitude lower elsewhere. The tone synth
    // (AudioSynth.tone) shares no code with the Goertzel filterbank.
    for (sr <- Seq(8000, 16000, 44100); b <- 0 until 8;
         n <- Seq(1600, 8821, 26460)) {
      val fMilliHz = (2L * b + 1) * (sr.toLong * 1000L / 32L)
      assert(sr.toLong * 1000L % 32L == 0L, s"sr=$sr center not integral milli-Hz")
      val bytes = AudioSynth.tone(sr, fMilliHz, n)
      val e = AudioCodec.bandEnergies(bytes, AudioCodec.Pcm16, sr)
      val argmax = e.indexOf(e.max)
      assert(argmax == b, s"sr=$sr b=$b n=$n argmax=$argmax: ${e.mkString(",")}")
      assert(e.max * 10 > e.sum * 9,
        s"sr=$sr b=$b n=$n concentration ${e.max / e.sum}")
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
