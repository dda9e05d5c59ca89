package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** r7 optimization-round equivalence gates: every kernel rewrite that
  * claims bit-identical output proves it here against the composition it
  * replaced (the pre-r7 arithmetic, reconstructed inline where the old
  * code path no longer exists).
  */
class KernelEquivalenceSpec extends AnyFunSuite {

  private def synthBytes(seed: Long, codec: String, n: Int = 4096): Array[Byte] =
    AudioCodec.encode(AudioSynth.synth(seed, 8000, n), codec)

  test("transcode fast paths == decode+encode composition, every codec pair") {
    val inputs = Seq(
      "pcm16" -> synthBytes(1, "pcm16"),
      "ulaw" -> synthBytes(2, "ulaw"),
      "alaw" -> synthBytes(3, "alaw"),
      // every possible companded byte value, both orders
      "ulaw" -> Array.tabulate(256)(_.toByte),
      "alaw" -> Array.tabulate(256)(_.toByte),
      // every possible 16-bit sample value for the pcm16 source paths
      "pcm16" -> Array.tabulate(131072)(i =>
        (if (i % 2 == 0) (i / 2) & 0xFF else ((i / 2) >> 8) & 0xFF).toByte),
      // odd-length pcm16 payload (the truncation edge)
      "pcm16" -> Array.tabulate(33)(_.toByte))
    for ((src, bytes) <- inputs; dst <- AudioCodec.Codecs) {
      val want = AudioCodec.encode(AudioCodec.decode(bytes, src), dst)
      val got = AudioCodec.transcode(bytes, src, dst)
      assert(java.util.Arrays.equals(got, want), s"$src -> $dst differs")
    }
  }

  test("G.711 decode LUTs == segment arithmetic, all 256 codes") {
    // reference arithmetic restated from ITU-T G.711 (the pre-LUT code)
    def ulawRef(ulaw: Byte): Short = {
      val u = (~ulaw) & 0xFF
      var t = ((u & 0xF) << 3) + 0x84
      t <<= (u & 0x70) >> 4
      val v = if ((u & 0x80) != 0) 0x84 - t else t - 0x84
      math.max(-32768, math.min(32767, v)).toShort
    }
    def alawRef(alaw: Byte): Short = {
      val a = (alaw ^ 0x55) & 0xFF
      var t = (a & 0xF) << 4
      val seg = (a & 0x70) >> 4
      if (seg == 0) t += 8
      else if (seg == 1) t += 0x108
      else { t += 0x108; t <<= (seg - 1) }
      (if ((a & 0x80) != 0) t else -t).toShort
    }
    (0 until 256).foreach { i =>
      val b = i.toByte
      assert(AudioCodec.ulawToLinear(b) == ulawRef(b), s"ulaw code $i")
      assert(AudioCodec.alawToLinear(b) == alawRef(b), s"alaw code $i")
    }
  }

  test("goertzelPowerMulti == goertzelPower per probe (bit-exact)") {
    val pcm = AudioSynth.synth(7, 8000, 2048)
    val fs = Array(80, 123, 440, 441, 1000, 2599)
    val multi = AudioCodec.goertzelPowerMulti(pcm, 8000, fs, 0, 1500)
    fs.zipWithIndex.foreach { case (f, i) =>
      val single = AudioCodec.goertzelPower(pcm, 8000, f, 0, 1500)
      assert(multi(i) == single, s"probe $f: ${multi(i)} != $single")
    }
  }

  test("toneBandEnergies == bandEnergies(tone(...), pcm16) (bit-exact)") {
    for (sr <- Seq(8000, 16000, 44100); b <- 0 until 8; nOff <- Seq(0, 1)) {
      val fMilli = (2L * b + 1) * (sr.toLong * 1000 / 32)
      val n = sr / 3 + nOff // odd/even tail coverage
      val fused = AudioCodec.toneBandEnergies(sr, fMilli, n, sr, 8)
      val unfused = AudioCodec.bandEnergies(
        AudioSynth.tone(sr, fMilli, n), "pcm16", sr, 8)
      assert(fused.toSeq == unfused.toSeq, s"sr=$sr b=$b n=$n")
    }
  }

  test("toneSamples phasor ~= direct trig (inside every downstream margin)") {
    for (sr <- Seq(8000, 44100); f <- Seq(150500L, 2756250L)) {
      val n = 40000
      val w = 2.0 * math.Pi * (f / 1000.0) / sr
      val got = AudioSynth.toneSamples(sr, f, n)
      var worst = 0.0
      (0 until n).foreach { i =>
        val direct = (0.5 * math.sin(w * i)).toFloat
        worst = math.max(worst, math.abs(got(i) - direct).toDouble)
      }
      // the phasor drift between resyncs (<= 1024 rotations of ~1-ulp
      // error, ~1e-13 in double) can move the FLOAT cast by at most one
      // float ulp (~6e-8 at amplitude 0.5) — and sits three orders of
      // magnitude below the 3e-5 int16 quantum the samples feed
      assert(worst <= 1.2e-7, s"sr=$sr f=$f worst=$worst")
    }
  }

  test("hash_comb_keys == the 4-subset packing formula (bit-exact)") {
    val rnd = new scala.util.Random(42)
    for (maxHamming <- Seq(5, 8, 12); _ <- 1 to 50) {
      val sig = rnd.nextLong()
      val c = maxHamming + 4
      val base = 64 / c
      val rem = 64 % c
      val offs = (0 until c).scanLeft(0)((o, i) =>
        o + base + (if (i < rem) 1 else 0))
      val cv = (0 until c).map { i =>
        val width = base + (if (i < rem) 1 else 0)
        (sig >>> offs(i)) & ((1L << width) - 1)
      }
      val want = (0 until c).combinations(4).map(idx =>
        idx.map(cv).reduceLeft((acc, v) => (acc << 16) | v)).toSeq
      val got = graft.functions.HashCombKeysKernel.keys(sig, maxHamming).toSeq
      assert(got == want, s"maxHamming=$maxHamming sig=$sig")
    }
  }
}
