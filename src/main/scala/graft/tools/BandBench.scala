package graft.tools

import graft.audio.AudioCodec

/** Scratch micro-benchmark: per-codec bandEnergies cost isolation. */
object BandBench {
  def main(args: Array[String]): Unit = {
    val n = 100000
    val sig = Array.tabulate(n)(i => (0.4 * math.sin(0.01 * i)).toFloat)
    val reps = 200
    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach(_ => f)
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"$label: ${(System.nanoTime() - t0) / 1e6 / reps}%.3f ms/call")
    }
    val p16 = AudioCodec.encode(sig, "pcm16")
    val ul = AudioCodec.encode(sig, "ulaw")
    val al = AudioCodec.encode(sig, "alaw")
    time("bands32 pcm16")(AudioCodec.bandEnergies(p16, "pcm16", 8000, 32))
    time("bands32 ulaw")(AudioCodec.bandEnergies(ul, "ulaw", 8000, 32))
    time("bands32 alaw")(AudioCodec.bandEnergies(al, "alaw", 8000, 32))
    time("bands8 pcm16")(AudioCodec.bandEnergies(p16, "pcm16", 8000, 8))
    time("rms ulaw")(AudioCodec.rms(ul, "ulaw"))
    time("decode ulaw")(AudioCodec.decode(ul, "ulaw"))
    time("toneBand 100k@8k")(AudioCodec.toneBandEnergies(8000, 1100250L, n, 8000, 8))
    time("toneSamples 100k")(graft.audio.AudioSynth.toneSamples(8000, 1100250L, n))
    time("tone+bands unfused")(AudioCodec.bandEnergies(
      graft.audio.AudioSynth.tone(8000, 1100250L, n), "pcm16", 8000, 8))
  }
}
