package graft.audio

import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.MixedAudioGen

/** Pins the container writer/reader pair to HAND-DERIVED golden bytes
  * from the public specs (RIFF/WAVE, xiph FLAC STREAMINFO, ISO 11172-3
  * frame headers, RFC 3533/7845 Ogg-Opus) so the two sides cannot drift
  * together, plus an INDEPENDENT reader check: the JDK's
  * javax.sound.sampled must parse our WAV output. */
class AudioMetaSpec extends AnyFunSuite {

  test("wavWrap emits the canonical 44-byte RIFF header (hand-derived)") {
    val b = AudioMeta.wavWrap(Array[Byte](1, 2, 3, 4), "pcm16", 8000)
    val golden = Array[Int](
      'R', 'I', 'F', 'F', 0x28, 0, 0, 0, // riff size 36 + 4
      'W', 'A', 'V', 'E', 'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, // format tag 1 = PCM
      1, 0, // mono
      0x40, 0x1F, 0, 0, // 8000 Hz
      0x80, 0x3E, 0, 0, // byte rate 16000
      2, 0, 16, 0, // block align 2, 16 bits
      'd', 'a', 't', 'a', 4, 0, 0, 0).map(_.toByte)
    assert(b.take(44).sameElements(golden))
    assert(b.drop(44).sameElements(Array[Byte](1, 2, 3, 4)))
  }

  test("wav roundtrip: wrap -> meta/unwrap -> identical payload, all codecs") {
    for (codec <- AudioCodec.Codecs; sr <- Seq(8000, 44100)) {
      val payload = AudioCodec.encode(AudioSynth.synth(7L, sr, 801), codec)
      val wav = AudioMeta.wavWrap(payload, codec, sr)
      val m = AudioMeta.parse(wav).get
      assert(m.format == "wav" && m.srHz == sr && m.channels == 1, s"$codec")
      assert(m.bits == (if (codec == "pcm16") 16 else 8))
      assert(m.nSamples == 801, s"$codec ${m.nSamples}")
      val (uc, usr, up) = AudioMeta.wavUnwrap(wav).get
      assert(uc == codec && usr == sr && up.sameElements(payload))
    }
  }

  test("INDEPENDENT reader: the JDK's AudioSystem parses our WAV output") {
    val payload = AudioCodec.encode(AudioSynth.synth(9L, 16000, 1600), "pcm16")
    val wav = AudioMeta.wavWrap(payload, "pcm16", 16000)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val f = in.getFormat
    assert(f.getSampleRate == 16000f && f.getChannels == 1 &&
      f.getSampleSizeInBits == 16)
    assert(in.getFrameLength == 1600)
    // mu-law tag too (AudioSystem knows G.711)
    val uwav = AudioMeta.wavWrap(
      AudioCodec.encode(AudioSynth.synth(9L, 8000, 400), "ulaw"), "ulaw", 8000)
    val uf = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(uwav)).getFormat
    assert(uf.getEncoding == javax.sound.sampled.AudioFormat.Encoding.ULAW)
  }

  test("FLAC STREAMINFO bit layout matches hand-derived golden bytes") {
    // sr=44100 (0xAC44), ch=2, bits=16, total=1234 (0x4D2):
    //   b10 = sr>>12 = 0x0A;  b11 = (sr>>4)&0xFF = 0xC4
    //   b12 = (sr&0xF)<<4 | (ch-1)<<1 | (bits-1)>>4 = 0x40|0x02|0 = 0x42
    //   b13 = ((bits-1)&0xF)<<4 | total>>32 = 0xF0
    //   b14..b17 = 0x00 0x00 0x04 0xD2
    val b = MixedAudioGen.flacBytes(44100, 2, 16, 1234L, seed = 1L)
    assert((b(4) & 0xFF) == 0x80 && b(7) == 34) // last-flagged STREAMINFO, len 34
    val si = b.drop(8)
    assert((si(10) & 0xFF) == 0x0A && (si(11) & 0xFF) == 0xC4)
    assert((si(12) & 0xFF) == 0x42 && (si(13) & 0xFF) == 0xF0)
    assert(Seq(si(14), si(15), si(16), si(17)).map(_ & 0xFF) ==
      Seq(0x00, 0x00, 0x04, 0xD2))
    val m = AudioMeta.parse(b).get
    assert(m == AudioMeta.Meta("flac", 44100, 2, 16, 1234L))
  }

  test("MP3 frame headers match the hand-derived golden; frames counted") {
    // 128 kbit/s (index 9) at 44100 (index 0), stereo -> FF FB 90 00,
    // frame length 144*128000/44100 = 417 bytes
    val b = MixedAudioGen.mp3Bytes(srIdx = 0, frames = 3, brIdx = 9,
      mono = false, seed = 2L)
    assert(Seq(b(0), b(1), b(2), b(3)).map(_ & 0xFF) ==
      Seq(0xFF, 0xFB, 0x90, 0x00))
    assert(b.length == 3 * 417)
    assert((b(417) & 0xFF) == 0xFF && (b(418) & 0xFF) == 0xFB) // next frame aligned
    val m = AudioMeta.parse(b).get
    assert(m == AudioMeta.Meta("mp3", 44100, 2, 0, 3 * 1152L))
    // truncated final frame: the complete prefix still counts
    val t = AudioMeta.parse(b.dropRight(10)).get
    assert(t.nSamples == 2 * 1152L)
  }

  test("Ogg-Opus: OpusHead fields + EOS granule minus pre-skip") {
    val b = MixedAudioGen.oggOpusBytes(16000, 2, preskip = 312, ns = 960L,
      seed = 3L)
    // hand-check the OpusHead packet on the BOS page: 28-byte page header
    // (27 + 1 segment), then magic, version 1, channels, preskip LE
    assert(new String(b.slice(28, 36), "US-ASCII") == "OpusHead")
    assert(b(36) == 1 && b(37) == 2)
    assert(((b(38) & 0xFF) | ((b(39) & 0xFF) << 8)) == 312)
    val m = AudioMeta.parse(b).get
    assert(m == AudioMeta.Meta("ogg", 16000, 2, 0, 960L))
  }

  test("fixture rows parse to exactly the planted values") {
    for (idx <- 0L until 64L) {
      val q = idx / 4
      val row = MixedAudioGen.audioRow(idx)
      val m = AudioMeta.parse(row.bytes).get
      val fmt = Seq("wav", "flac", "mp3", "ogg")((idx % 4).toInt)
      assert(m.format == fmt, s"idx=$idx")
      assert(m.channels == 1 + (q % 2).toInt, s"idx=$idx")
      val expSr =
        if (fmt == "mp3") Seq(44100, 48000, 32000)((q % 3).toInt)
        else Seq(8000, 16000, 44100)((q % 3).toInt)
      assert(m.srHz == expSr, s"idx=$idx")
      val expN =
        if (fmt == "mp3") 1152L * (2 + (q % 4)) else 400L + (q % 5) * 160
      assert(m.nSamples == expN, s"idx=$idx got ${m.nSamples}")
    }
  }

  test("malformed and fuzz payloads never throw — always None") {
    val rnd = new java.util.Random(42)
    assert(AudioMeta.parse(null).isEmpty)
    assert(AudioMeta.parse(Array.emptyByteArray).isEmpty)
    for (_ <- 0 until 3000) {
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      AudioMeta.parse(b) // must not throw
      AudioMeta.wavUnwrap(b)
    }
    // truncations of every valid fixture format must parse-or-None, never throw
    for (idx <- 0L until 8L; cut <- Seq(1, 5, 13, 29, 45)) {
      val b = MixedAudioGen.audioRow(idx).bytes
      AudioMeta.parse(b.take(math.min(cut, b.length)))
    }
    // stereo WAV must not unwrap (mono-by-contract)
    val stereoWav = (0L until 64L).map(MixedAudioGen.audioRow)
      .find(r => AudioMeta.parse(r.bytes).exists(m =>
        m.format == "wav" && m.channels == 2)).get
    assert(AudioMeta.wavUnwrap(stereoWav.bytes).isEmpty)
  }
}
