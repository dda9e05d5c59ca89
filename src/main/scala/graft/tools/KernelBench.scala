package graft.tools

import graft.audio.AudioCodec
import graft.fixtures.ClipGen

/** Micro-benchmark for the per-clip DSP kernels (no Spark session): the
  * single-thread cost that multiplies into every full-corpus audio query.
  * Run: `sbt "runMain graft.tools.KernelBench [nClips]"`. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200
    val rows = (0L until n.toLong).map(ClipGen.clipRow)
    def time(label: String)(f: => Unit): Unit = {
      f // warmup (JIT)
      f
      val t0 = System.nanoTime()
      f
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"$label: ${ms / n}%.3f ms/clip  (${ms}%.0f ms / $n clips)")
    }
    time("bandEnergies32-pre")(rows.foreach(r =>
      AudioCodec.bandEnergies(r.bytes, r.codec, r.sr_hz, 32)))
    time("tonePair")(rows.foreach(r => AudioCodec.tonePair(r.bytes, r.codec, r.sr_hz)))
    time("bandEnergies32")(rows.foreach(r =>
      AudioCodec.bandEnergies(r.bytes, r.codec, r.sr_hz, 32)))
    time("rms")(rows.foreach(r => AudioCodec.rms(r.bytes, r.codec)))
    time("decode")(rows.foreach(r => AudioCodec.decode(r.bytes, r.codec)))
  }
}
